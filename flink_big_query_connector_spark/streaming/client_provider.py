"""Pluggable Storage Write API client seam.

The reference isolates client construction behind provider classes —
``client/BigQueryProtoClientProvider.java:45-101`` builds the
``BigQueryWriteClient`` + ``StreamWriter`` (endpoint, credentials,
``setEnableConnectionPool``), ``client/BigQueryJsonClientProvider.java:
80-93`` the JSON twin — so sink writers hold a PROVIDER, never a
concrete client.  This module is the Spark port of that seam:

- :class:`StorageWriteClient` is the structural protocol every backend
  client must satisfy — exactly the five Write-API verbs the sink state
  machines (A8–A16) call, with the semantics the contract tests in
  ``tests/test_client_contract.py`` pin (offset-checked appends,
  ALREADY_EXISTS/OUT_OF_RANGE branching, oversized-append refusal,
  finalize, FlushRows visibility).

- :class:`ClientProvider` is the reference's ``BigQueryClientProvider``
  analogue: a small PICKLABLE factory the sinks ship into executor
  tasks; ``client()`` is called once per task/pool slot (the
  per-subtask writer pattern) so the provider itself must never hold a
  live connection.

- :class:`FakeBigQueryClientProvider` wraps the in-process, file-locked
  :class:`~..sources.fake_bigquery.FakeBigQuery` — the sanctioned
  harness backend.

- :class:`GoogleBigQueryStorageClientProvider` is the import-gated seam
  for the public ``google-cloud-bigquery-storage`` package (not
  installed in this environment): it documents, method by method, how
  each protocol verb maps onto the real service so dropping it in is a
  transcription exercise, not a design one.  Constructing it without
  the package raises immediately with that mapping in the message.

The retry/trim/split state machines (``sinks.write_with_retry``) are
already backend-agnostic — they branch purely on the typed errors in
``streaming/errors.py``, which mirror gRPC status codes — so swapping
providers swaps the transport, never the semantics.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Protocol, runtime_checkable

# Module-level import ON PURPOSE (not lazy inside client()): once
# sources.bq_datasource registers this package's modules for cloudpickle
# BY-VALUE pickling, a lazy in-method import would resolve the REAL
# fake_bigquery module inside the executor worker while write_with_retry
# (shipped by value) catches the BY-VALUE exception classes — the raised
# OffsetAlreadyExistsError would sail past its own trim handler on class
# identity.  A module-global reference keeps FakeBigQuery inside the one
# consistent pickle graph (this module is itself in the by-value set;
# see bq_datasource.register_bq_datasource).
from ..sources.fake_bigquery import FakeBigQuery


@runtime_checkable
class StorageWriteClient(Protocol):
    """The five Storage-Write-API verbs the sink machines call.

    Error contract (see ``streaming/errors.py``; pinned by
    ``tests/test_client_contract.py``):

    - ``append`` with ``offset`` behind the stream end raises
      ``OffsetAlreadyExistsError`` (gRPC ALREADY_EXISTS) carrying
      expected/actual so the caller can trim (A13);
    - ``append`` with ``offset`` ahead raises ``OffsetOutOfRangeError``
      (OUT_OF_RANGE);
    - an append whose serialized payload exceeds the service limit
      raises ``MessageTooLargeError`` so the caller splits (A14);
    - appending to a finalized stream raises ``StreamFinalizedError``;
    - unknown streams raise ``StreamNotFoundError``.
    """

    def create_write_stream(
        self, table: str, stream_type: str = "BUFFERED",
        name: str | None = None,
    ) -> str:
        """CreateWriteStream; returns the stream name."""
        ...

    def get_write_stream(self, table: str, stream: str):
        """GetWriteStream; returns stream info (type/offset/finalized)."""
        ...

    def finalize_stream(self, table: str, stream: str) -> None:
        """FinalizeWriteStream."""
        ...

    def append(
        self, table: str, stream: str, rows: list, offset: int = -1
    ) -> int:
        """AppendRows; ``offset == -1`` is a default-stream append.
        Returns the next offset."""
        ...

    def flush_rows(self, table: str, stream: str, offset: int) -> int:
        """FlushRows: make rows up to and including ``offset`` visible
        (BUFFERED streams).  Returns the new flush point."""
        ...


class ClientProvider:
    """Abstract picklable client factory (the ``BigQueryClientProvider``
    seam).  Subclasses carry only plain configuration state."""

    def client(self) -> StorageWriteClient:
        raise NotImplementedError


@dataclass(frozen=True)
class FakeBigQueryClientProvider(ClientProvider):
    """Provider for the in-process directory-backed fake backend.

    Picklable by construction (one string of state); ``client()`` is a
    cheap handle over the shared directory, safe to call once per
    executor task — the same pattern a real gRPC client pool uses."""

    backend_root: str

    def client(self) -> StorageWriteClient:
        return FakeBigQuery(self.backend_root)


@dataclass(frozen=True)
class GoogleBigQueryStorageClientProvider(ClientProvider):
    """Seam for the public ``google-cloud-bigquery-storage`` client.

    NOT runnable in this environment (the package is deliberately not a
    dependency); the value of this class is the pinned method mapping —
    an adapter object returned by ``client()`` would implement
    :class:`StorageWriteClient` as:

    ====================  ==================================================
    protocol verb         google.cloud.bigquery_storage_v1 call
    ====================  ==================================================
    create_write_stream   ``BigQueryWriteClient.create_write_stream(
                          parent=table_path, write_stream=WriteStream(
                          type_=stream_type))`` (reference
                          ``BigQueryProtoClientProvider.java:45-58``
                          builds the equivalent ``StreamWriter``;
                          ``enable_connection_pool`` maps to
                          ``StreamWriter.setEnableConnectionPool``,
                          ``:47-49``)
    get_write_stream      ``BigQueryWriteClient.get_write_stream(name=...)``
    finalize_stream       ``BigQueryWriteClient.finalize_write_stream``
    append                ``AppendRowsStream.send(AppendRowsRequest(
                          offset=..., proto_rows | json_rows=...))``; map
                          ``google.api_core.exceptions.AlreadyExists`` →
                          ``OffsetAlreadyExistsError`` (row trim, A13),
                          ``InvalidArgument`` on >10 MB appends →
                          ``MessageTooLargeError`` (split, A14),
                          ``Aborted/Unavailable/Internal/Cancelled/
                          Unknown`` → ``AppendException(status)`` so
                          ``write_with_retry`` branches exactly as the
                          reference's ``BigQueryBufferedSinkWriter.java:
                          72-190``
    flush_rows            ``BigQueryWriteClient.flush_rows(
                          write_stream=..., offset=...)``
    ====================  ==================================================

    Construction fails fast when the package is absent so a
    misconfigured deployment cannot silently fall back."""

    project: str
    credentials_path: str | None = None
    enable_connection_pool: bool = False

    def client(self) -> StorageWriteClient:
        try:
            import google.cloud.bigquery_storage_v1  # noqa: F401
        except ImportError as exc:  # pragma: no cover - environment gate
            raise ImportError(
                "google-cloud-bigquery-storage is not installed; this "
                "provider is the documented integration seam (see class "
                "docstring for the verb-by-verb mapping).  Install the "
                "package and implement the adapter to use a real "
                "BigQuery backend; every sink state machine and "
                "contract test is backend-agnostic already."
            ) from exc
        raise NotImplementedError(
            "adapter transcription pending; see class docstring mapping"
        )
