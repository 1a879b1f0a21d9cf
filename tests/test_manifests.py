"""Manifest/config sources (S3-S6) and CTC geometry kernels (P8/P10)."""

from __future__ import annotations

import numpy as np

from greenocr_ray import kernels
from greenocr_ray.sources.manifests import (
    parse_iam64_lines,
    parse_pipe_lines,
    read_config,
    read_iam64_manifest,
    read_pipe_manifest,
    read_sidecar_labels,
)


def test_pipe_manifest(ray_session, tmp_path):
    p = tmp_path / "targets.txt"
    p.write_text("img1.png|hello world\nmalformed line\nimg2.png|a|b\n")
    samples, rejects = parse_pipe_lines(p.read_text().splitlines())
    # 'a|b' splits once: text keeps the second pipe (maxsplit=1)
    assert samples == [("img1.png", "hello world"), ("img2.png", "a|b")]
    assert rejects == ["malformed line"]
    ds = read_pipe_manifest(str(p))
    rows = {r["key"]: r["text"] for r in ds.take_all()}
    assert rows == {"img1.png": "hello world", "img2.png": "a|b"}


def test_iam64_manifest(ray_session, tmp_path):
    p = tmp_path / "iam64.txt"
    p.write_text("a01,a01-000u-00 A MOVE to stop\nbroken\n")
    samples, rejects = parse_iam64_lines(p.read_text().splitlines())
    assert samples == [("a01/a01-000u-00.png", "A MOVE to stop")]
    assert rejects == ["broken"]
    ds = read_iam64_manifest(str(p))
    assert ds.take_all()[0]["key"] == "a01/a01-000u-00.png"


def test_sidecar_labels(ray_session, tmp_path):
    d = tmp_path / "Transcriptions"
    d.mkdir()
    (d / "img_7.txt").write_text("seven\n")
    (d / "img_3.txt").write_text("three")
    (d / "notes.md").write_text("ignored")
    rows = {r["key"]: r["text"] for r in read_sidecar_labels(str(d)).take_all()}
    assert rows == {"img_7": "seven", "img_3": "three"}


def test_read_config(tmp_path):
    p = tmp_path / "ref.cnf"
    p.write_text("model_interface = models/best.pth\nimgTest=test_images\n\n")
    cfg = read_config(str(p))
    assert cfg["model_interface"] == "models/best.pth"
    assert cfg["imgTest"] == "test_images"


def test_required_width_for_ctc():
    # T >= 2U-1 with downsample 32 and 1.1 safety (train.py:828-830)
    assert kernels.required_width_for_ctc(5) == int((2 * 5 - 1) * 32 * 1.1)


def test_pad_to_ctc_safe_width():
    img = np.zeros((8, 40), dtype=np.float32)
    out = kernels.pad_to_ctc_safe_width(img, target_len=5, max_width=2048)
    assert out.shape[0] == 8
    assert out.shape[1] % 32 == 0
    assert out.shape[1] >= kernels.required_width_for_ctc(5)
    # original content preserved, padding is background
    assert (out[:, :40] == 0).all() and (out[:, 40:] == 1.0).all()
    # clamp at max_width (train.py:310)
    wide = kernels.pad_to_ctc_safe_width(img, target_len=100, max_width=2048)
    assert wide.shape[1] == 2048


def test_resize_fixed():
    img = np.random.default_rng(1).random((30, 90)).astype(np.float32)
    out = kernels.resize_fixed(img, out_w=128, out_h=64)
    assert out.shape == (64, 128)
