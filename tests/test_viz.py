"""Headless visualization export: the reference's tensor-grid validation
surface (gbv.go:1209-1313, agabor/gabor.go:318-326) as PNG files."""

import numpy as np
import pytest

pytest.importorskip("matplotlib")

from auditory_tpu.config import GaborSet, default_gabor_specs
from auditory_tpu.utils import viz


def _png_ok(path):
    with open(path, "rb") as f:
        magic = f.read(8)
    assert magic == b"\x89PNG\r\n\x1a\n", path


def test_render_npz_dict(tmp_path):
    rng = np.random.default_rng(0)
    data = {
        "mel_fbank_segment": rng.random((3, 32, 10)),  # 3-D -> segment grid
        "power_segment": rng.random((201, 10)),        # 2-D -> heatmap
        "energy": rng.random(10),                      # 1-D -> line
        "mfcc_deltas": rng.standard_normal((13, 10)),  # signed -> diverging
        "step_valid": np.ones(10, dtype=bool),         # bool handled
        "empty": np.zeros((0, 3)),                     # skipped
    }
    written = viz.render_npz(data, str(tmp_path / "v"))
    names = {p.split("/")[-1] for p in written}
    assert names == {
        "mel_fbank_segment.png", "power_segment.png", "energy.png",
        "mfcc_deltas.png", "step_valid.png",
    }
    for p in written:
        _png_ok(p)


def test_render_npz_file_and_keys(tmp_path):
    npz = tmp_path / "o.npz"
    np.savez(npz, a=np.random.default_rng(1).random((4, 5)), b=np.arange(6.0))
    written = viz.render_npz(str(npz), str(tmp_path / "v"), keys=["a"])
    assert len(written) == 1 and written[0].endswith("a.png")
    _png_ok(written[0])


def test_render_compare(tmp_path):
    rng = np.random.default_rng(3)
    data = {
        "a_mel_fbank_segment": rng.random((32, 10)),
        "b_mel_fbank_segment": rng.random((32, 10)),   # same shape -> diff panel
        "a_gabor_kwta": rng.random((16, 24)),
        "b_gabor_kwta": rng.random((16, 30)),          # shape mismatch -> no diff
        "a_energy": rng.random(10),
        "b_energy": rng.random(10),                    # 1-D -> two lines
        "a_step_valid": np.ones(10, dtype=bool),
        "b_step_valid": np.ones(10, dtype=bool),
        "a_only": rng.random((4, 4)),                  # unpaired -> flat render
    }
    written = viz.render_compare(data, str(tmp_path / "c"))
    names = {p.split("/")[-1] for p in written}
    assert names == {
        "compare_mel_fbank_segment.png", "compare_gabor_kwta.png",
        "compare_energy.png", "compare_step_valid.png",
    }
    for p in written:
        _png_ok(p)

    # key filter validates against paired base keys
    written = viz.render_compare(data, str(tmp_path / "c2"), keys=["energy"])
    assert len(written) == 1 and written[0].endswith("compare_energy.png")
    with pytest.raises(RuntimeError):
        viz.render_compare(data, str(tmp_path / "c3"), keys=["a_only"])


def test_render_npz_autodetects_compare(tmp_path):
    rng = np.random.default_rng(4)
    data = {
        "a_mel_fbank_segment": rng.random((8, 6)),
        "b_mel_fbank_segment": rng.random((8, 6)),
        "a_only": rng.random((4, 4)),
    }
    written = viz.render_npz(data, str(tmp_path / "v"))
    names = {p.split("/")[-1] for p in written}
    assert names == {"compare_mel_fbank_segment.png", "a_only.png"}

    # explicit keys bypass pairing
    written = viz.render_npz(
        data, str(tmp_path / "v2"), keys=["a_mel_fbank_segment"]
    )
    assert len(written) == 1 and written[0].endswith("a_mel_fbank_segment.png")


def test_render_gabor_bank(tmp_path):
    gset = GaborSet(
        size_x=9, size_y=9,
        specs=default_gabor_specs(phases=(0.0, 1.5708)),
    )
    p = viz.render_gabor_bank(gset, str(tmp_path / "bank.png"))
    _png_ok(p)


def test_cli_viz(tmp_path):
    from auditory_tpu.cli import main

    npz = tmp_path / "o.npz"
    np.savez(npz, mel=np.random.default_rng(2).random((8, 6)))
    out = str(tmp_path / "viz")
    rc = main(["viz", str(npz), "--out", out, "--gabor-bank"])
    assert rc == 0
    import os

    files = set(os.listdir(out))
    assert {"mel.png", "gabor_bank.png"} <= files

    # nothing to render
    assert main(["viz", "--out", out]) == 1
