"""Apache-VFS URI schemes — ``fiona.open('zip://archive.zip!member')``
parity (`fiona/vfs.py`, `fiona/_path.py`).

The reference translates these URIs into GDAL ``/vsizip/``-style
virtual paths; the engine resolves the local-archive schemes itself
(zip/tar/gzip members extract to a scratch directory, shapefile
sidecars included) and passes remote schemes (s3/gs/https) through to
the cluster filesystem — Spark's Hadoop IO is the engine's virtual-IO
layer, so ``s3://`` needs no translation beyond the S3A connector
mapping documented in SURVEY.md §2.1 (cloud credentials are
``spark.conf``, n/a in this sandbox).

Syntax accepted (the reference's): ``zip://relative/or/abs.zip!member``
and ``zip+file://...``; the ``!`` splits archive from member.
"""

from __future__ import annotations

import gzip
import os
import shutil
import tarfile
import tempfile
import zipfile
from urllib.parse import urlparse

from .errors import DriverError

# scheme -> handler family (the reference's SCHEMES table maps the
# same names onto GDAL VSI suffixes)
SCHEMES = {
    "zip": "archive", "tar": "archive", "gzip": "archive",
    "file": "local",
    "http": "remote", "https": "remote", "ftp": "remote",
    "s3": "remote", "gs": "remote",
}
ARCHIVESCHEMES = {k for k, v in SCHEMES.items() if v == "archive"}
REMOTESCHEMES = {k for k, v in SCHEMES.items() if v == "remote"}


def valid_vsi(vsi: str) -> bool:
    """Every '+'-joined part is a known scheme (fiona.vfs.valid_vsi)."""
    return all(p in SCHEMES for p in vsi.split("+"))


def is_remote(scheme: str | None) -> bool:
    if not scheme:
        return False
    return any(p in REMOTESCHEMES for p in scheme.split("+"))


def parse_paths(uri: str, vfs: str | None = None):
    """URI -> (path, scheme, archive) — fiona.vfs.parse_paths
    semantics: the '!' separates the archive from the member path; a
    netloc other than localhost rejoins the path (relative archives
    like ``zip://tests/data/x.zip!y.shp`` parse as netloc + path)."""
    archive = scheme = None
    path = uri
    if vfs:
        parts = urlparse(vfs)
        scheme = parts.scheme or None
        archive = parts.path
        if parts.netloc and parts.netloc != "localhost":
            archive = parts.netloc + archive
        return path, scheme, archive
    parts = urlparse(path)
    scheme = parts.scheme or None
    if scheme in SCHEMES or (scheme and valid_vsi(scheme)):
        path = parts.path
        if parts.netloc and parts.netloc != "localhost":
            path = parts.netloc + path
        if "!" in path:
            archive, _, path = path.rpartition("!")
        elif scheme in ARCHIVESCHEMES:
            archive, path = path, None
        return path, scheme, archive
    return uri, None, None


def _extract_member(archive: str, member: str, out_dir: str,
                    scheme: str) -> str:
    """Extract one member (+ same-stem shapefile sidecars) from a
    local zip/tar archive; gunzip whole-file for gzip."""
    member = (member or "").lstrip("/")
    if scheme == "gzip":
        dst = os.path.join(out_dir, os.path.basename(
            archive[:-3] if archive.endswith(".gz") else archive + ".out"))
        with gzip.open(archive, "rb") as src, open(dst, "wb") as out:
            shutil.copyfileobj(src, out)
        return dst
    if not member:
        raise DriverError(f"{scheme}:// URI needs '!member' in {archive!r}")
    stem = os.path.splitext(member)[0] + "."
    if scheme == "zip":
        with zipfile.ZipFile(archive) as zf:
            zf.extract(member, out_dir)
            for other in zf.namelist():
                if other != member and other.startswith(stem):
                    zf.extract(other, out_dir)
    elif scheme == "tar":
        with tarfile.open(archive) as tf:
            names = tf.getnames()
            if member not in names:
                raise DriverError(f"no member {member!r} in {archive!r}")
            for other in names:
                if other == member or other.startswith(stem):
                    tf.extract(other, out_dir, filter="data")
    else:
        raise DriverError(f"unsupported archive scheme {scheme!r}")
    return os.path.join(out_dir, member)


def resolve(uri: str) -> str:
    """A VFS URI -> a plain path the driver registry can open.

    Local archive members extract once per (archive mtime, member)
    into a scratch directory; remote schemes pass through for the
    cluster filesystem; ``file://`` strips to a plain path.
    """
    path, scheme, archive = parse_paths(uri)
    if scheme is None:
        return uri
    base = scheme.split("+")[-1] if "+" in scheme else scheme
    head = scheme.split("+")[0]
    if head in REMOTESCHEMES or (head not in ARCHIVESCHEMES
                                 and head != "file"):
        return uri                      # hadoop-side scheme, untouched
    if head == "file":
        return path or uri
    if base != "file" and base in REMOTESCHEMES:
        raise DriverError(
            f"remote archives ({scheme}://) need a cluster-side copy; "
            "download first or read the unpacked dataset directly")
    if not archive or not os.path.exists(archive):
        raise DriverError(f"no archive at {archive!r} (from {uri!r})")
    tag = f"{abs(hash((os.path.abspath(archive), os.path.getmtime(archive), path or '')))%10**10:010d}"
    out_dir = os.path.join(tempfile.gettempdir(), f"fiona_spark_vfs_{tag}")
    target_probe = _extract_target(out_dir, head, archive, path)
    if not os.path.exists(target_probe):
        os.makedirs(out_dir, exist_ok=True)
        return _extract_member(archive, path, out_dir, head)
    return target_probe


def _extract_target(out_dir: str, scheme: str, archive: str,
                    member: str | None) -> str:
    if scheme == "gzip":
        return os.path.join(out_dir, os.path.basename(
            archive[:-3] if archive.endswith(".gz") else archive + ".out"))
    return os.path.join(out_dir, (member or "").lstrip("/"))
