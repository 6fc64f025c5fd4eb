"""Manifest/export contract + multimodal plumbing + UI validators."""

from __future__ import annotations

import json
import os
import zipfile

import numpy as np
import pytest

from fairy_core_spark.datagen.images import images_df
from fairy_core_spark.functions.image_codec import decode_image
from fairy_core_spark.operators.multimodal import (
    audio_features,
    image_features,
    resize_images,
    sample_video_frames,
)
from fairy_core_spark.operators.ui_checks import (
    column_name_mismatch,
    duplicate_in_column,
    missing_required,
)
from fairy_core_spark.plans.manifest import (
    NotSubmissionReady,
    attach_attestation,
    build_manifest_v1,
    export_submission,
    infer_role,
)


def test_role_inference():
    assert infer_role("a/b/samples.tsv") == "metadata"
    assert infer_role("preflight_report.json") == "report"
    assert infer_role("run.log") == "log"
    assert infer_role("data/reads.fastq") == "data"
    assert infer_role("whatever.bin") == "other"
    assert infer_role("manifest.json") == "metadata"


def test_attestation_pass_only():
    m = build_manifest_v1("sha256:abc", "0.1.0", "r.json", "rp", "1", [])
    attach_attestation(m, {"fail": 0, "warn": 2, "pass": 3})
    assert m["submission_ready"] and m["attestation_id"].startswith("fairy:attest:")
    attach_attestation(m, {"fail": 1, "warn": 0, "pass": 0})
    assert not m["submission_ready"] and "attestation_id" not in m


def test_export_refuses_then_bundles(tmp_path):
    report = {
        "dataset_id": "sha256:deadbeef",
        "summary": {"by_level": {"fail": 1, "warn": 0, "pass": 5}},
        "metadata": {"rulepack": {"id": "rp", "version": "1"}},
    }
    art = tmp_path / "preflight_report.json"
    art.write_text("{}")
    with pytest.raises(NotSubmissionReady):
        export_submission(report, [str(art)], str(tmp_path), "0.1.0")
    report["summary"]["by_level"]["fail"] = 0
    bundle = export_submission(
        report, [str(art)], str(tmp_path), "0.1.0", snapshot_refs={"images": "snapX"}
    )
    manifest = json.loads(open(os.path.join(bundle, "manifest.json")).read())
    assert manifest["attestation_id"].startswith("fairy:attest:")
    roles = {f["path"]: f["role"] for f in manifest["files"]}
    assert roles["preflight_report.json"] == "report"
    assert roles["images.parquet"] == "data"
    assert zipfile.ZipFile(bundle + ".zip").namelist()


def test_resize_and_features(spark):
    imgs = images_df(spark, 60, partitions=4)
    small = resize_images(imgs, 16, 16).collect()
    assert len(small) == 60
    px = decode_image(bytes(small[0]["bytes"]), small[0]["fmt"])
    assert px.shape == (16, 16, 3)
    feats = image_features(imgs).collect()
    assert len(feats) == 60
    h = np.array(feats[0]["hist"])
    assert h.shape == (12,) and abs(h[:4].sum() - 1.0) < 1e-9


def test_video_frames_stub_and_fake(spark):
    vids = spark.createDataFrame(
        [("v1", b"\x00", "mp4", 120), ("v2", b"\x00", "mp4", 45)],
        "video_id string, bytes binary, fmt string, n_frames int",
    )
    with pytest.raises(Exception) as ei:
        sample_video_frames(vids, every_n=30).collect()
    assert "NotImplementedError" in str(ei.value) or "no video codec" in str(ei.value)
    frames = sample_video_frames(vids, every_n=30, use_fake=True).collect()
    by_vid = {}
    for f in frames:
        by_vid.setdefault(f["video_id"], []).append(f["frame_index"])
    assert sorted(by_vid["v1"]) == [0, 30, 60, 90]
    assert sorted(by_vid["v2"]) == [0, 30]
    px = decode_image(bytes(frames[0]["frame_bytes"]), "ppm")
    assert px.shape == (8, 8, 3)


def test_audio_stub_and_fake(spark):
    aud = spark.createDataFrame(
        [("a1", b"\x01" * 44100, "wav-ish", 44100)],
        "audio_id string, bytes binary, fmt string, sample_rate int",
    )
    with pytest.raises(Exception):
        audio_features(aud).collect()
    rows = audio_features(aud, use_fake=True).collect()
    assert rows[0]["duration_s"] == 1.0 and 0.0 <= rows[0]["rms"] <= 1.0


def test_ui_validators(spark):
    from fairy_core_spark.sources.tables import with_row_id_by_order

    df = spark.createDataFrame(
        [("A1", "x"), ("", "y"), ("a1", "z")], "`Sample ID` string, sample_id string"
    )
    df = with_row_id_by_order(df, "sample_id")
    issues, cells = missing_required(df, ["Sample ID", "nope"])
    kinds = {i.kind for i in issues}
    assert "missing_column" in kinds and "missing_value" in kinds
    assert cells.count() == 1

    dup_issues, dup_cells = duplicate_in_column(df, "Sample ID")
    assert {i.row for i in dup_issues} == {0, 2}  # A1 vs a1, case-insensitive

    hdr = column_name_mismatch(df)
    assert hdr and hdr[0].kind == "column_name_mismatch"


def test_wav_codec_roundtrip():
    """Real PCM RIFF/WAVE: sine roundtrip recovers amplitude, duration and
    RMS (1/sqrt(2) x amp) to 16-bit precision; 8-bit and stereo paths too."""
    from fairy_core_spark.functions.av_codec import decode_wav, encode_wav

    sr = 8000
    t = np.arange(sr * 2) / sr  # 2 seconds
    x = 0.5 * np.sin(2 * np.pi * 440.0 * t)
    blob = encode_wav(x, sr)
    y, rate = decode_wav(blob)
    assert rate == sr and y.shape == (sr * 2, 1)
    assert np.abs(y[:, 0] - x).max() < 1e-3
    assert abs(float(np.sqrt((y**2).mean())) - 0.5 / np.sqrt(2)) < 1e-3
    stereo = encode_wav(np.stack([x, -x], axis=1), sr)
    y2, _ = decode_wav(stereo)
    assert y2.shape == (sr * 2, 2) and np.abs(y2[:, 1] + x).max() < 1e-3


def test_ppmv_codec_random_access():
    from fairy_core_spark.functions.av_codec import (
        decode_ppmv_frame,
        encode_ppmv,
        ppmv_info,
    )

    frames = [
        np.full((6, 8, 3), i * 10, dtype=np.uint8) + np.arange(8, dtype=np.uint8)[None, :, None]
        for i in range(10)
    ]
    blob = encode_ppmv(frames, fps=5)
    assert ppmv_info(blob) == (10, 8, 6, 5)
    for i in (0, 3, 9):
        assert (decode_ppmv_frame(blob, i) == frames[i]).all()
    with pytest.raises(IndexError):
        decode_ppmv_frame(blob, 10)


def test_video_frames_real_ppmv(spark):
    """fmt='ppmv' takes the REAL decode path: sampled frames are pixel-
    identical to the source frames at the sampled indices."""
    from fairy_core_spark.functions.av_codec import encode_ppmv

    src_frames = [np.full((4, 4, 3), i, dtype=np.uint8) for i in range(100)]
    vids = spark.createDataFrame(
        [("v1", bytearray(encode_ppmv(src_frames, fps=30)), "ppmv", 100)],
        "video_id string, bytes binary, fmt string, n_frames int",
    )
    got = sample_video_frames(vids, every_n=30, max_frames=4).collect()
    assert sorted(r["frame_index"] for r in got) == [0, 30, 60, 90]
    for r in got:
        px = decode_image(bytes(r["frame_bytes"]), "ppm")
        assert (px == src_frames[r["frame_index"]]).all()


def test_audio_features_real_wav(spark):
    from fairy_core_spark.functions.av_codec import encode_wav

    sr = 4000
    t = np.arange(sr * 3) / sr
    x = 0.25 * np.sin(2 * np.pi * 220.0 * t)
    aud = spark.createDataFrame(
        [("a1", bytearray(encode_wav(x, sr)), "wav", sr)],
        "audio_id string, bytes binary, fmt string, sample_rate int",
    )
    rows = audio_features(aud).collect()  # no use_fake: real path
    assert rows[0]["duration_s"] == 3.0
    assert abs(rows[0]["rms"] - 0.25 / np.sqrt(2)) < 1e-3


def test_export_rejects_duplicate_basenames(tmp_path):
    report = {
        "dataset_id": "sha256:deadbeef",
        "summary": {"by_level": {"fail": 0, "warn": 0, "pass": 5}},
        "metadata": {"rulepack": {"id": "rp", "version": "1"}},
    }
    a = tmp_path / "runA" / "report.json"
    b = tmp_path / "runB" / "report.json"
    a.parent.mkdir()
    b.parent.mkdir()
    a.write_text("{\"run\": \"A\"}")
    b.write_text("{\"run\": \"B\"}")
    with pytest.raises(ValueError, match="duplicate artifact basenames"):
        export_submission(report, [str(a), str(b)], str(tmp_path), "0.1.0")


def test_export_rebuilds_bundle_dir_from_scratch(tmp_path, monkeypatch):
    """Under FAIRY_FIXED_TIMESTAMP every export maps to the same bundle
    dir; a second export with a DIFFERENT artifact set must not inherit the
    first's leftovers (the zip would contain files the manifest does not
    list)."""
    import json as _json
    import os
    import zipfile

    monkeypatch.setenv("FAIRY_FIXED_TIMESTAMP", "2026-01-01T00:00:00Z")
    report = {
        "dataset_id": "sha256:deadbeef",
        "summary": {"by_level": {"fail": 0, "warn": 0, "pass": 5}},
        "metadata": {"rulepack": {"id": "rp", "version": "1"}},
    }
    first = tmp_path / "stale_artifact.json"
    second = tmp_path / "fresh_artifact.json"
    first.write_text("{}")
    second.write_text("{}")

    b1 = export_submission(report, [str(first)], str(tmp_path), "0.1.0")
    b2 = export_submission(report, [str(second)], str(tmp_path), "0.1.0")
    assert b1 == b2  # deterministic stamp -> same dir, rebuilt
    assert not os.path.exists(os.path.join(b2, "stale_artifact.json"))

    with zipfile.ZipFile(b2 + ".zip") as z:
        names = set(z.namelist())
    manifest = _json.loads(open(os.path.join(b2, "manifest.json")).read())
    listed = {f["path"] for f in manifest["files"] if f.get("role") != "data"}
    # zip contents == manifest-listed artifacts + the manifest itself
    assert names == listed | {"manifest.json"}
