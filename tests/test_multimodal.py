"""Multimodal plumbing tests: binary column schema, Arrow batch shape,
deterministic fake decode, and the NotImplementedError gate for the real
decoder (functions.multimodal)."""

import hashlib

import numpy as np
import pytest

from theta_spark.functions.multimodal import (
    _decode_bytes,
    extract_media_features,
    synth_media_df,
)


def _docs(spark):
    return spark.createDataFrame(
        [("d1", "hello world"), ("d2", "other text")], "doc_id string, text string"
    )


def test_media_schema(spark):
    m = synth_media_df(spark, _docs(spark))
    assert m.schema.simpleString() == (
        "struct<media_id:string,kind:string,width:int,height:int,payload:binary>"
    )
    rows = {r.media_id: r for r in m.collect()}
    assert set(rows) == {"d1", "d2"}
    assert rows["d1"].kind in ("image", "audio")
    # payload = raw sha256 digest bytes of the text
    assert bytes(rows["d1"].payload) == hashlib.sha256(b"hello world").digest()


def test_feature_extraction_deterministic(spark):
    m = synth_media_df(spark, _docs(spark))
    f1 = sorted(map(tuple, extract_media_features(m, fake_decode=True).collect()))
    f2 = sorted(map(tuple, extract_media_features(m, fake_decode=True).collect()))
    assert f1 == f2
    assert all(r[2] == 32 for r in f1)  # sha256 -> 32 bytes


def test_feature_values_match_numpy(spark):
    m = synth_media_df(spark, _docs(spark))
    import math

    row = {r.media_id: r for r in extract_media_features(m, fake_decode=True).collect()}["d1"]
    arr = np.frombuffer(hashlib.sha256(b"hello world").digest(), dtype=np.uint8)
    assert row.n_bytes == 32
    assert row.byte_mean == math.floor(float(arr.mean()) * 10000 + 0.5) / 10000
    assert row.byte_std == math.floor(float(arr.std()) * 10000 + 0.5) / 10000
    ds = arr.reshape(-1, 8).mean(axis=1).astype(np.uint8)
    key = "-".join(str(int(v)) for v in ds)
    assert row.phash == hashlib.md5(key.encode()).hexdigest()[:16]


def test_real_decode_is_gated():
    with pytest.raises(NotImplementedError):
        _decode_bytes(b"\x00\x01", "image", fake=False)


def test_real_decode_gate_surfaces_in_spark(spark):
    m = synth_media_df(spark, _docs(spark))
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import PythonException

    with pytest.raises((PythonException, Py4JJavaError)):
        extract_media_features(m, fake_decode=False).collect()
