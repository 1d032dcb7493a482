"""GCS provider: scheme-agnostic client paths over a mocked ``gs://`` FS.

The reference's GCS provider is pure storage wiring — the client logic is
identical to the filesystem provider (GCSRawdataClientInitializer.java:43-82
vs FilesystemAvroRawdataClientInitializer.java:32-42), which its
integration test proves against a real bucket
(GCSRawdataClientIntegrationTest.java:40-77, ignored by default).  Offline,
these tests prove the same composition by mounting the ``gs`` scheme on
Hadoop's ViewFileSystemOverloadScheme with a local fallback target: every
engine path (producer flush, Spark parquet write, listing, rename-commit,
consumer scan) runs against ``gs://bucket/...`` URIs end to end.  A real
bucket test runs only when ``RAWDATA_GCS_TEST_BUCKET`` is configured.
"""

import os

import pytest

from rawdata_client_provider_gcs_spark import (
    RawdataClient,
    RawdataMessage,
    gcs_connector_conf,
)


@pytest.fixture()
def gs_mount(spark, tmp_path):
    """Mount gs://fake-bucket/ onto a local temp dir for this test."""
    backing = tmp_path / "bucket"
    backing.mkdir()
    hconf = spark._jsc.hadoopConfiguration()
    hconf.set(
        "fs.gs.impl", "org.apache.hadoop.fs.viewfs.ViewFileSystemOverloadScheme"
    )
    hconf.set(
        "fs.viewfs.overload.scheme.target.file.impl",
        "org.apache.hadoop.fs.LocalFileSystem",
    )
    hconf.set("fs.viewfs.mounttable.fake-bucket.linkFallback", f"file://{backing}")
    # FileSystem caches instances per (scheme, authority); drop any cached
    # mount pointing at a previous test's backing dir.
    spark._jvm.org.apache.hadoop.fs.FileSystem.closeAll()
    yield backing


def test_gcs_provider_roundtrip_mocked(spark, gs_mount):
    client = RawdataClient(spark, "gs://fake-bucket/rawdata", provider="gcs")
    assert client.root_uri == "gs://fake-bucket/rawdata"
    with client.producer("t") as p:
        for i in range(5):
            p.publish(RawdataMessage(position=f"p-{i}", data={"k": bytes([i])}))
    c = client.consumer("t")
    got = []
    while True:
        msg = c.receive(0)
        if msg is None:
            break
        got.append(msg.position)
    assert got == [f"p-{i}" for i in range(5)]
    assert client.last_message("t").position == "p-4"
    # the bytes really landed under the mounted backing dir
    files = [
        f
        for f in os.listdir(gs_mount / "rawdata" / "t")
        if not f.startswith(".") and f != "metadata"
    ]
    assert files and all(f.endswith(".parquet") for f in files)
    client.close()


def test_gcs_provider_bulk_publish_distributed(spark, gs_mount):
    """Spark's own parquet writer + the rename-commit protocol over gs://."""
    client = RawdataClient(spark, "gs://fake-bucket/bulk", provider="gcs")
    df = spark.range(0, 200).selectExpr(
        "cast(id as string) position", "1700000000000 + id * 1000 as ts_ms"
    )
    with client.producer("events") as p:
        files = p.publish_dataframe(df, ts_ms_col="ts_ms", max_records_per_file=50)
    assert len(files) >= 4 and all(f.startswith("gs://fake-bucket/") for f in files)
    topic = client.topic("events")
    assert topic.dataframe().count() == 200
    c = client.consumer("events", seek_to_ts_ms=1700000000000 + 199 * 1000)
    assert c.receive(0).position == "199"
    client.close()


def test_gcs_connector_conf_scoping():
    """Credential scoping parity with GCSRawdataClientInitializer.java:43-82."""
    rw = gcs_connector_conf(keyfile="/secrets/sa.json", upload_chunk_mb=8)
    assert rw["spark.hadoop.fs.gs.impl"].endswith("GoogleHadoopFileSystem")
    assert (
        rw["spark.hadoop.google.cloud.auth.service.account.json.keyfile"]
        == "/secrets/sa.json"
    )
    assert rw["spark.hadoop.fs.gs.outputstream.upload.chunk.size"] == str(8 << 20)
    assert "read_only" not in str(rw)
    ro = gcs_connector_conf(read_only=True)
    assert ro["spark.hadoop.fs.gs.auth.access.token.provider.scope"].endswith(
        "devstorage.read_only"
    )
    # no credentials requested -> no auth keys (compute-engine defaults)
    assert not any("auth.service.account" in k for k in ro)


@pytest.mark.skipif(
    "RAWDATA_GCS_TEST_BUCKET" not in os.environ,
    reason="set RAWDATA_GCS_TEST_BUCKET (and connector jar) for live GCS test",
)
def test_gcs_provider_roundtrip_live(spark):
    """Reference integration-test shape against a real bucket (opt-in)."""
    bucket = os.environ["RAWDATA_GCS_TEST_BUCKET"]
    client = RawdataClient(spark, f"gs://{bucket}/rawdata-engine-it", provider="gcs")
    with client.producer("it") as p:
        p.publish(RawdataMessage(position="live-1", data={"k": b"v"}))
    assert client.consumer("it").receive(0).position == "live-1"
    client.close()
