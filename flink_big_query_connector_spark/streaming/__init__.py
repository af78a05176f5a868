from .config import WriterRetrySettings, WriterSettings  # noqa: F401
from .errors import AppendException, AsyncWriterException, StatusCode  # noqa: F401
