"""boto3-backed S3 BlobStore: the object-store plugin for the engine's
filesystem registry.

Reference mapping: blobstore/s3/s3_store.go and blobstore/minio/
minio_store.go implement the BlobStore interface (store.go:33-67) over
the S3 object API — Get/Put/List/Delete with immutable whole-object
writes, prefix listing, and NO atomic rename (the manifest layer's
existence pre-check provides the conditional-Put commit discipline,
engine.go:1942-1967). This module is the same store shape for the Spark
engine: a pyarrow FileSystemHandler speaking the S3 API through boto3,
registered via register_filesystem(), so every manifest / index-artifact /
stats path under an `s3://bucket/…` table root resolves through it.

Why a handler instead of pyarrow's native S3FileSystem: the native client
is also supported (plans/manifest._fs_for falls through to
FileSystem.from_uri), but a boto3 store (a) works against any
s3-compatible endpoint (MinIO, moto) including ones whose multipart
implementation the Arrow C++ client rejects, and (b) keeps the BlobStore
extension point honest — the engine never special-cases the scheme.

S3 semantics encoded here:
  * objects are immutable; output streams buffer and PUT once on close
    (the reference's Put takes the whole payload, s3_store.go);
  * "directories" are key prefixes; create_dir writes a zero-byte
    `prefix/` marker (ignored by listings);
  * move is copy+delete — callers must not rely on rename atomicity
    (save_manifest's non-local branch never calls move);
  * Spark executors do NOT read through this store — parquet segment IO
    goes through Hadoop's s3a connector, a deployment (jar) concern.
    Everything the ENGINE itself reads/writes (manifests, IVF centroid /
    SQ bound artifacts, retention GC) is covered.
"""

from __future__ import annotations

import io
import logging
import sys

from vecgo_spark.plans.manifest import register_filesystem


def _is_not_found(exc: BaseException) -> bool:
    """True only for a definitive 404-class S3 answer. Anything else —
    throttling, auth, network — must propagate: fs_exists backs the
    manifest commit guard (manifest.py save_manifest), and a transient
    error read as "absent" would void the conditional-put discipline and
    allow a manifest version to be silently overwritten (lost update).
    Commit safety fails closed."""
    try:
        from botocore.exceptions import ClientError
    except ImportError:  # pragma: no cover — botocore absent
        return False
    if not isinstance(exc, ClientError):
        return False
    err = exc.response.get("Error", {})
    status = exc.response.get("ResponseMetadata", {}).get("HTTPStatusCode")
    return status == 404 or str(err.get("Code", "")) in (
        "404", "NotFound", "NoSuchKey", "NoSuchBucket")


def _split(path: str) -> tuple[str, str]:
    """'bucket/key/parts' → (bucket, 'key/parts'); bare bucket → (b, '')."""
    path = path.lstrip("/")
    if "/" not in path:
        return path, ""
    b, k = path.split("/", 1)
    return b, k


class _PutOnClose(io.BytesIO):
    """Whole-object PUT on close — S3 objects are immutable, so the write
    stream is a buffer and the upload is the commit point.

    Error discipline: if the close happens while a NEW exception is
    unwinding (one that was not already being handled when the stream was
    opened — e.g. the writer raised mid-`with`), the PUT is suppressed and
    nothing is published, matching the reference's whole-payload Put which
    leaves no object on failure. Suppression is NEVER silent: close-time
    detection cannot distinguish a failed write from an (exotic) caller
    closing inside an unrelated except-block, so the suppressed key is
    logged at WARNING — an intentional cancel should use abort(), which
    is silent."""

    def __init__(self, client, bucket: str, key: str):
        super().__init__()
        self._client, self._bucket, self._key = client, bucket, key
        self._exc_at_open = sys.exc_info()[1]
        self._aborted = False

    def abort(self) -> None:
        self._aborted = True

    def close(self):
        if not self.closed:
            exc = sys.exc_info()[1]
            if self._aborted:
                pass  # explicit cancel — publish nothing, silently
            elif exc is None or exc is self._exc_at_open:
                self._client.put_object(
                    Bucket=self._bucket, Key=self._key, Body=self.getvalue()
                )
            else:
                logging.getLogger(__name__).warning(
                    "suppressing S3 PUT of s3://%s/%s (%d bytes): stream "
                    "closed while %s was unwinding; call abort() to cancel "
                    "silently", self._bucket, self._key,
                    self.getbuffer().nbytes, type(exc).__name__)
        super().close()


def make_s3_handler(client):
    """FileSystemHandler over a boto3 S3 client. Built lazily so pyarrow
    is only imported when a store is actually registered."""
    from pyarrow import PythonFile
    from pyarrow.fs import FileInfo, FileSystemHandler, FileType

    class S3StoreHandler(FileSystemHandler):
        def __init__(self, c):
            self.client = c

        def __eq__(self, other):
            return isinstance(other, S3StoreHandler) and other.client is self.client

        def __ne__(self, other):
            return not self.__eq__(other)

        def get_type_name(self):
            return "vecgo+s3"

        def normalize_path(self, path):
            return path.lstrip("/")

        # ---------------------------------------------------- info
        def _info_one(self, path):
            # only a definitive 404 maps to NotFound; transient errors
            # (throttle/auth/network) re-raise so the manifest commit
            # guard fails closed instead of overwriting (see _is_not_found)
            bucket, key = _split(path)
            if not key:
                try:
                    self.client.head_bucket(Bucket=bucket)
                    return FileInfo(path, FileType.Directory)
                except Exception as e:  # noqa: BLE001
                    if not _is_not_found(e):
                        raise
                    return FileInfo(path, FileType.NotFound)
            try:
                head = self.client.head_object(Bucket=bucket, Key=key)
                return FileInfo(path, FileType.File, size=head["ContentLength"],
                                mtime=head.get("LastModified"))
            except Exception as e:  # noqa: BLE001
                if not _is_not_found(e):
                    raise
            resp = self.client.list_objects_v2(
                Bucket=bucket, Prefix=key.rstrip("/") + "/", MaxKeys=1
            )
            if resp.get("KeyCount", 0) > 0:
                return FileInfo(path, FileType.Directory)
            return FileInfo(path, FileType.NotFound)

        def get_file_info(self, paths):
            return [self._info_one(p) for p in paths]

        def get_file_info_selector(self, selector):
            base = selector.base_dir
            info = self._info_one(base)
            if info.type == FileType.NotFound:
                if selector.allow_not_found:
                    return []
                raise FileNotFoundError(base)
            bucket, key = _split(base)
            prefix = key.rstrip("/") + "/" if key else ""
            kwargs = dict(Bucket=bucket, Prefix=prefix)
            if not selector.recursive:
                kwargs["Delimiter"] = "/"
            infos, token = [], None
            while True:
                resp = self.client.list_objects_v2(
                    **kwargs, **({"ContinuationToken": token} if token else {})
                )
                for cp in resp.get("CommonPrefixes", []):
                    p = cp["Prefix"].rstrip("/")
                    infos.append(FileInfo(f"{bucket}/{p}", FileType.Directory))
                for obj in resp.get("Contents", []):
                    k = obj["Key"]
                    if k.endswith("/"):  # directory marker
                        continue
                    infos.append(FileInfo(f"{bucket}/{k}", FileType.File,
                                          size=obj["Size"],
                                          mtime=obj.get("LastModified")))
                token = resp.get("NextContinuationToken")
                if not token:
                    return infos

        # ---------------------------------------------------- mutate
        def create_dir(self, path, recursive):
            bucket, key = _split(path)
            if recursive:
                try:
                    self.client.head_bucket(Bucket=bucket)
                except Exception:  # noqa: BLE001 — bucket missing → create
                    self.client.create_bucket(Bucket=bucket)
            if key:
                self.client.put_object(Bucket=bucket, Key=key.rstrip("/") + "/",
                                       Body=b"")

        def _keys_under(self, bucket, prefix):
            token, keys = None, []
            while True:
                resp = self.client.list_objects_v2(
                    Bucket=bucket, Prefix=prefix,
                    **({"ContinuationToken": token} if token else {}),
                )
                keys += [o["Key"] for o in resp.get("Contents", [])]
                token = resp.get("NextContinuationToken")
                if not token:
                    return keys

        def delete_dir(self, path):
            bucket, key = _split(path)
            prefix = key.rstrip("/") + "/" if key else ""
            for k in self._keys_under(bucket, prefix):
                self.client.delete_object(Bucket=bucket, Key=k)

        def delete_dir_contents(self, path, missing_dir_ok):
            # bucket-root clears are ALWAYS refused (that is what
            # delete_root_dir_contents is for); missing_dir_ok means
            # "tolerate a missing directory", nothing else
            bucket, key = _split(path)
            if not key:
                raise ValueError(f"refusing to clear bucket root {path!r}; "
                                 "use delete_root_dir_contents")
            info = self._info_one(path)
            if info.type == FileType.NotFound:
                if missing_dir_ok:
                    return
                raise FileNotFoundError(path)
            prefix = key.rstrip("/") + "/"
            for k in self._keys_under(bucket, prefix):
                if k != prefix:  # keep the directory's own marker object
                    self.client.delete_object(Bucket=bucket, Key=k)

        def delete_root_dir_contents(self):
            raise NotImplementedError("bucket-wide wipe is not a store operation")

        def delete_file(self, path):
            bucket, key = _split(path)
            self.client.head_object(Bucket=bucket, Key=key)  # raise if absent
            self.client.delete_object(Bucket=bucket, Key=key)

        def move(self, src, dest):
            # copy+delete: no rename on object stores (s3_store.go has none)
            self.copy_file(src, dest)
            self.delete_file(src)

        def copy_file(self, src, dest):
            sb, sk = _split(src)
            db, dk = _split(dest)
            self.client.copy_object(
                Bucket=db, Key=dk, CopySource={"Bucket": sb, "Key": sk}
            )

        # ---------------------------------------------------- streams
        def open_input_stream(self, path):
            bucket, key = _split(path)
            body = self.client.get_object(Bucket=bucket, Key=key)["Body"].read()
            return PythonFile(io.BytesIO(body), mode="r")

        open_input_file = open_input_stream

        def open_output_stream(self, path, metadata):
            bucket, key = _split(path)
            return PythonFile(_PutOnClose(self.client, bucket, key), mode="w")

        def open_append_stream(self, path, metadata):
            raise NotImplementedError("S3 objects are immutable; no append")

    return S3StoreHandler(client)


def register_s3_store(scheme: str = "s3", *, client=None, **boto_kwargs):
    """Build a boto3 S3 client (or take one) and register it for
    `scheme://bucket/…` paths — the plug-in call a deployment makes once
    at startup (the BlobStore registration shape, store.go:33-67).
    Returns the pyarrow FileSystem for direct use; unregister by popping
    the scheme from plans.manifest._FS_REGISTRY (tests do)."""
    import boto3
    from pyarrow.fs import PyFileSystem

    fs = PyFileSystem(make_s3_handler(client or boto3.client("s3", **boto_kwargs)))
    register_filesystem(scheme, lambda rest: (fs, rest))
    return fs
