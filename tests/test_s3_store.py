"""Engine blobstore against a REAL s3-compatible endpoint (moto server):
the boto3-backed S3 store (plans/blobstore_s3.py ≙ blobstore/s3/
s3_store.go + minio_store.go) registered for `s3://` URIs, exercising
path-style addressing, prefix listing, pagination-shaped listing code,
whole-object puts, no-rename commit, and retention GC over actual HTTP —
the object-store assumptions file:// runs can't validate.

Boundary: Spark's parquet segment IO rides Hadoop's s3a connector (a
deployment jar, absent in this container), so the lifecycle pieces that
call spark.read/write are exercised on file:// in test_remote_store.py;
everything the ENGINE itself touches (manifests, index artifacts, GC) is
tested here against S3 for real.
"""

import json

import pytest

boto3 = pytest.importorskip("boto3")
pytest.importorskip("moto")

from vecgo_spark.plans import manifest as mf  # noqa: E402
from vecgo_spark.plans.blobstore_s3 import register_s3_store  # noqa: E402

BUCKET = "vecgo-it"


@pytest.fixture(scope="module")
def s3(request):
    from moto.server import ThreadedMotoServer

    server = ThreadedMotoServer(ip_address="127.0.0.1", port=0)
    server.start()
    host, port = server.get_host_and_port()
    url = f"http://{host}:{port}"
    client = boto3.client(
        "s3", endpoint_url=url, region_name="us-east-1",
        aws_access_key_id="testing", aws_secret_access_key="testing",
    )
    client.create_bucket(Bucket=BUCKET)
    register_s3_store("s3", client=client)
    yield client
    mf._FS_REGISTRY.pop("s3", None)
    server.stop()


def test_fs_helpers_roundtrip(s3):
    root = f"s3://{BUCKET}/t0"
    mf.fs_makedirs(f"{root}/_index")
    mf.fs_write_text(f"{root}/_index/ivf.json", json.dumps({"k": 4}))
    assert mf.fs_exists(f"{root}/_index/ivf.json")
    assert not mf.fs_exists(f"{root}/_index/nope.json")
    assert json.loads(mf.fs_read_text(f"{root}/_index/ivf.json")) == {"k": 4}
    mf.fs_write_text(f"{root}/_index/sq.json", "{}")
    assert sorted(mf.fs_listdir(f"{root}/_index")) == ["ivf.json", "sq.json"]
    assert mf.fs_du(f"{root}/_index") == len(json.dumps({"k": 4})) + 2
    mf.fs_remove_file(f"{root}/_index/sq.json")
    assert mf.fs_listdir(f"{root}/_index") == ["ivf.json"]
    mf.fs_rmtree(f"{root}/_index")
    assert mf.fs_listdir(f"{root}/_index") == []


def test_manifest_lifecycle_on_s3(s3):
    table_dir = f"s3://{BUCKET}/tables/t1"
    m1 = mf.Manifest(version=1, lsn=0, next_id=1, created_at=1.0,
                     meta={"dim": 2, "metric": "l2"})
    mf.save_manifest(table_dir, m1)
    m2 = mf.Manifest(
        version=2, lsn=3, next_id=9, created_at=2.0,
        segments=[mf.SegmentMeta(path="_segments/seg-a", rows=8, lsn=3)],
        meta={"dim": 2, "metric": "l2"},
    )
    mf.save_manifest(table_dir, m2)
    assert mf.list_versions(table_dir) == [1, 2]
    got = mf.load_manifest(table_dir)
    assert got.version == 2 and got.segments[0].rows == 8
    assert mf.load_manifest(table_dir, version=1).version == 1
    # time travel by timestamp resolves through the S3 listing
    assert mf.load_manifest(table_dir, timestamp=1.5).version == 1


def test_concurrent_commit_guard_on_s3(s3):
    """The commit point is the existence pre-check + whole-object put —
    the conditional-Put discipline object stores need (no rename)."""
    table_dir = f"s3://{BUCKET}/tables/t2"
    m = mf.Manifest(version=1, lsn=0, next_id=1, created_at=1.0, meta={})
    mf.save_manifest(table_dir, m)
    with pytest.raises(FileExistsError):
        mf.save_manifest(table_dir, m)


def test_retention_gc_deletes_objects(s3):
    """Vacuum-shaped GC: drop old manifest objects + an orphan artifact,
    verify via a fresh prefix listing that S3 really lost them."""
    table_dir = f"s3://{BUCKET}/tables/t3"
    for v in (1, 2, 3):
        mf.save_manifest(
            table_dir, mf.Manifest(version=v, lsn=v, next_id=1,
                                   created_at=float(v), meta={}))
    mf.fs_write_text(f"{table_dir}/_index/orphan.json", "{}")
    # keep only the newest version, as vacuum(keep_versions=1) would
    for v in mf.list_versions(table_dir)[:-1]:
        mf.fs_remove_file(mf.manifest_path(table_dir, v))
    mf.fs_rmtree(f"{table_dir}/_index")
    assert mf.list_versions(table_dir) == [3]
    keys = [o["Key"] for o in s3.list_objects_v2(
        Bucket=BUCKET, Prefix="tables/t3/")["Contents"]]
    assert not [k for k in keys if "orphan" in k]
    assert [k for k in keys if k.endswith(".json")] == [
        "tables/t3/_manifest/v00000003.json"]


def test_large_listing_paginates(s3):
    """>1000 objects forces ListObjectsV2 continuation — the pagination
    path a file:// run never exercises."""
    prefix = f"s3://{BUCKET}/big"
    for i in range(1100):
        s3.put_object(Bucket=BUCKET, Key=f"big/f{i:04d}", Body=b"x")
    assert len(mf.fs_listdir(prefix)) == 1100
    assert mf.fs_du(prefix) == 1100
    mf.fs_rmtree(prefix)
    assert mf.fs_listdir(prefix) == []


def test_transient_error_fails_closed_not_notfound(s3):
    """A non-404 S3 failure (throttle/auth/network) must PROPAGATE, never
    read as NotFound — fs_exists backs save_manifest's concurrent-commit
    guard, and a transient error mapped to 'absent' would let a manifest
    version be overwritten (lost update)."""
    from botocore.exceptions import ClientError

    class _Proxy:
        def __init__(self, inner):
            self._inner = inner

        def __getattr__(self, name):
            if name in ("head_object", "head_bucket"):
                def boom(**kw):
                    raise ClientError(
                        {"Error": {"Code": "SlowDown", "Message": "throttled"},
                         "ResponseMetadata": {"HTTPStatusCode": 503}},
                        name,
                    )
                return boom
            return getattr(self._inner, name)

    from vecgo_spark.plans.blobstore_s3 import register_s3_store as reg
    reg("s3throttle", client=_Proxy(s3))
    try:
        with pytest.raises(Exception, match="SlowDown|throttled"):
            mf.fs_exists(f"s3throttle://{BUCKET}/t0/whatever.json")
    finally:
        mf._FS_REGISTRY.pop("s3throttle", None)


def test_aborted_write_publishes_nothing(s3):
    """An exception mid-write must leave NO object behind (the reference's
    whole-payload Put publishes nothing on failure) — a truncated manifest
    would corrupt the newest version."""
    from pyarrow import fs as pafs

    fs, root = mf._fs_for(f"s3://{BUCKET}/t-abort")
    key = f"{BUCKET}/t-abort/manifest.json"
    with pytest.raises(RuntimeError, match="writer died"):
        with fs.open_output_stream(key) as f:
            f.write(b'{"version":')
            raise RuntimeError("writer died")
    assert fs.get_file_info(key).type == pafs.FileType.NotFound
    # and the normal path still publishes
    with fs.open_output_stream(key) as f:
        f.write(b"{}")
    assert fs.get_file_info(key).type == pafs.FileType.File


def test_delete_dir_contents_semantics(s3):
    from pyarrow import fs as pafs

    fs, _ = mf._fs_for(f"s3://{BUCKET}/t-ddc")
    mf.fs_makedirs(f"s3://{BUCKET}/t-ddc/sub")
    mf.fs_write_text(f"s3://{BUCKET}/t-ddc/sub/a.json", "{}")
    # bucket root is ALWAYS refused, regardless of missing_dir_ok
    with pytest.raises(Exception, match="bucket root"):
        fs.delete_dir_contents(BUCKET, missing_dir_ok=True)
    # missing dir: error by default, tolerated with missing_dir_ok
    with pytest.raises(FileNotFoundError):
        fs.delete_dir_contents(f"{BUCKET}/t-ddc/nope")
    fs.delete_dir_contents(f"{BUCKET}/t-ddc/nope", missing_dir_ok=True)
    # present dir: contents removed
    fs.delete_dir_contents(f"{BUCKET}/t-ddc/sub")
    assert mf.fs_listdir(f"s3://{BUCKET}/t-ddc/sub") == []
    assert fs.get_file_info(f"{BUCKET}/t-ddc/sub/a.json").type == pafs.FileType.NotFound
