"""Multimodal column plumbing tests (SURVEY §2 #48): binary columns,
Arrow-batched feature extraction, gated decode, frame sampling."""

from __future__ import annotations

import hashlib

import pytest

from flink_learning_practise_spark.operators import multimodal as mm


@pytest.fixture(scope="module")
def media_df(spark):
    rows = [
        (1, "image", bytes(range(256)) * 8, ("image/png", 64, 64, None)),
        (2, "audio", b"\x00" * 4096, ("audio/wav", None, None, 2000)),
        (3, "video", bytes((i * 7) % 256 for i in range(30 * 1024)), ("video/mp4", 320, 240, 5000)),
        (4, "image", None, ("image/png", 0, 0, None)),
    ]
    return spark.createDataFrame(rows, mm.MEDIA_SCHEMA)


def test_content_stats_jvm_side(spark, media_df):
    out = mm.attach_content_stats(media_df)
    rows = {r.doc_id: r for r in out.collect()}
    assert rows[1].content_size == 2048
    assert rows[1].content_sha256 == hashlib.sha256(bytes(range(256)) * 8).hexdigest()
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_byte_histogram_features(spark, media_df):
    feats = {r.doc_id: r for r in mm.byte_histogram_features(media_df).collect()}
    # uniform bytes → maximal entropy (log2 16 = 4), uniform histogram
    assert feats[1].entropy == pytest.approx(4.0)
    assert all(h == pytest.approx(1 / 16) for h in feats[1].histogram)
    # constant bytes → zero entropy, all mass in bin 0
    assert feats[2].entropy == 0.0
    assert feats[2].histogram[0] == 1.0
    assert feats[4].content_size == 0


def test_decode_image_gated(spark, media_df):
    decoded = {r.doc_id: r for r in mm.decode_image(media_df.filter("modality = 'image'")).collect()}
    assert set(decoded) == {1, 4}
    r = decoded[1]
    assert r.decoder in ("pil", "fake")
    assert 64 <= r.width < 256 and 64 <= r.height < 256
    # deterministic across runs
    again = {x.doc_id: x for x in mm.decode_image(media_df.filter("modality = 'image'")).collect()}
    assert again[1].width == r.width and again[1].mean_intensity == r.mean_intensity


def test_sample_frames(spark, media_df):
    frames = mm.sample_frames(media_df.filter("doc_id = 3"), frame_size=1024, every_n=10).collect()
    # 30 frames of 1 KiB, every 10th → indexes 0, 10, 20
    assert sorted(f.frame_index for f in frames) == [0, 10, 20]
    assert all(len(f.frame) == 1024 for f in frames)


def test_resize_image_contract(spark, media_df):
    imgs = media_df.filter("modality = 'image'")
    out = {r.doc_id: r for r in mm.resize_image(imgs, 32, 16).collect()}
    assert out  # at least one image row in the fixture
    for r in out.values():
        assert (r.width, r.height) == (32, 16)
        assert r.decoder in ("pil", "fake")
        if r.decoder == "fake":
            assert len(r.content) == 32 * 16  # fixed-shape payload
    again = {x.doc_id: x for x in mm.resize_image(imgs, 32, 16).collect()}
    assert {k: bytes(v.content) for k, v in out.items()} == {
        k: bytes(v.content) for k, v in again.items()
    }  # deterministic


def test_real_codec_path_via_injected_module(spark, media_df):
    """The same pipelines must run green on the REAL-codec branch: a
    PIL-compatible stub module is injected (PIL itself is absent in
    this container), the decoder column reports 'pil', and the decode
    is a true function of the bytes (not the digest fake).  The stub is
    defined in-function so cloudpickle ships it by VALUE to executors
    (a module-level class would pickle by reference and fail to import
    on the worker)."""

    class StubImage:
        """Minimal PIL-compatible Image over raw fixture bytes."""

        def __init__(self, data: bytes):
            self._data = data

        @staticmethod
        def open(buf):
            return StubImage(buf.read())

        def convert(self, mode):
            return self

        @property
        def size(self):
            return (max(len(self._data), 1), 1)

        def getdata(self):
            return list(self._data) or [0]

        def resize(self, wh):
            w, h = wh
            reps = (w * h) // max(len(self._data), 1) + 1
            return StubImage((self._data * reps)[: w * h])

        def save(self, buf, format=None):
            buf.write(b"PNG:" + self._data)

    imgs = media_df.filter("modality = 'image'")
    decoded = {r.doc_id: r for r in mm.decode_image(imgs, image_module=StubImage).collect()}
    assert decoded and all(r.decoder == "pil" for r in decoded.values())
    for r in decoded.values():
        assert r.width >= 1 and r.height == 1  # stub: 1-px-tall strip
    resized = {r.doc_id: r for r in mm.resize_image(imgs, 8, 4, image_module=StubImage).collect()}
    assert all(r.decoder == "pil" for r in resized.values())
    assert all(bytes(r.content).startswith(b"PNG:") for r in resized.values())
    # fake fallback still the default when no module is importable
    fb = mm.decode_image(imgs).collect()
    assert all(r.decoder == "fake" for r in fb)
