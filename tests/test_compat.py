"""Protobuf-shim hardening: the shim directory rides every child
interpreter's PYTHONPATH, so it must live under a user-private 0700
base whose ownership/permissions are verified before reuse (a shared
/tmp path + makedirs(exist_ok=True) would adopt another user's
directory and expose a symlink-swap TOCTOU into driver and workers)."""

import os
import stat

from flink_big_query_connector_spark import compat


def _patch_bases(monkeypatch, tmp_path):
    """Point both candidate roots (home cache, tmp) into tmp_path."""
    monkeypatch.setenv("HOME", str(tmp_path / "home"))
    monkeypatch.setattr(
        compat.tempfile, "gettempdir", lambda: str(tmp_path / "tmp")
    )
    (tmp_path / "tmp").mkdir(exist_ok=True)


def test_private_base_is_created_0700_and_owned(monkeypatch, tmp_path):
    _patch_bases(monkeypatch, tmp_path)
    base = compat._private_shim_base()
    assert base == str(tmp_path / "home" / ".cache" / "fbqcs")
    st = os.lstat(base)
    assert stat.S_ISDIR(st.st_mode)
    assert st.st_uid == os.getuid()
    assert not (st.st_mode & 0o077), oct(st.st_mode)


def test_private_base_repairs_loose_perms_when_owned(monkeypatch, tmp_path):
    _patch_bases(monkeypatch, tmp_path)
    base = tmp_path / "home" / ".cache" / "fbqcs"
    base.mkdir(parents=True)
    os.chmod(base, 0o777)
    got = compat._private_shim_base()
    assert got == str(base)
    assert not (os.lstat(got).st_mode & 0o077)


def test_private_base_refuses_symlinked_candidate(monkeypatch, tmp_path):
    """A symlink planted at the candidate path (the attack shape) is
    refused — lstat sees a link, not a directory — and the next
    candidate (per-uid tmp dir) is used instead."""
    _patch_bases(monkeypatch, tmp_path)
    cache = tmp_path / "home" / ".cache"
    cache.mkdir(parents=True)
    (tmp_path / "elsewhere").mkdir()
    os.symlink(tmp_path / "elsewhere", cache / "fbqcs")
    got = compat._private_shim_base()
    assert got == str(
        tmp_path / "tmp" / f"fbqcs-{os.getuid()}"
    )
    assert not (os.lstat(got).st_mode & 0o077)


def test_make_shim_builds_under_private_base(monkeypatch, tmp_path):
    _patch_bases(monkeypatch, tmp_path)
    bundle = tmp_path / "bundle"
    (bundle / "google" / "protobuf").mkdir(parents=True)
    (bundle / "google" / "protobuf" / "__init__.py").write_text("")
    shim = compat._make_shim(str(bundle))
    assert shim is not None
    assert shim.startswith(str(tmp_path / "home" / ".cache" / "fbqcs"))
    link = os.path.join(shim, "google", "protobuf")
    assert os.path.islink(link)
    assert os.readlink(link) == str(bundle / "google" / "protobuf")
    # re-entry with a DIFFERENT bundle path gets its own keyed shim dir
    bundle2 = tmp_path / "bundle2"
    (bundle2 / "google" / "protobuf").mkdir(parents=True)
    shim2 = compat._make_shim(str(bundle2))
    assert shim2 != shim
    # re-entry with the same bundle reuses (and re-verifies) the link
    assert compat._make_shim(str(bundle)) == shim


def test_make_shim_retargets_stale_symlink(monkeypatch, tmp_path):
    """An existing shim whose symlink points somewhere else (stale or
    tampered) is re-pointed at the requested bundle, never trusted."""
    _patch_bases(monkeypatch, tmp_path)
    bundle = tmp_path / "bundle"
    (bundle / "google" / "protobuf").mkdir(parents=True)
    shim = compat._make_shim(str(bundle))
    link = os.path.join(shim, "google", "protobuf")
    os.remove(link)
    os.symlink(tmp_path / "evil", link)
    assert compat._make_shim(str(bundle)) == shim
    assert os.readlink(link) == str(bundle / "google" / "protobuf")


def test_make_shim_none_when_no_private_base(monkeypatch, tmp_path):
    _patch_bases(monkeypatch, tmp_path)
    monkeypatch.setattr(compat, "_private_shim_base", lambda: None)
    assert compat._make_shim(str(tmp_path / "bundle")) is None
