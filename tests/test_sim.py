"""Tests: NavGrid geometry, channels/SH, image-source oracle physics."""

import numpy as np
import pytest

from sonicsim_tpu.sim import (
    ChannelModel,
    NavGrid,
    Scene,
    ShoeboxRoom,
    SyntheticRirOracle,
    BankRirOracle,
    channel_count,
    generate_xy_grid_points,
    image_sources,
    real_sh_matrix,
    render_rir_bank,
    render_shoebox_rir,
    sample_trajectory,
    save_rir_bank,
    select_static_points,
)

SR = 16000


def test_channel_counts():
    """Parity: SonicSim_rir.py:158-166."""
    assert channel_count("Mono") == 1
    assert channel_count("Binaural") == 2
    assert channel_count("Ambisonics", 1) == 4
    assert channel_count("Ambisonics", 3) == 16
    assert channel_count("CustomArrayIR", mic_array=[[0, 0, 0]] * 4) == 4


def test_real_sh_order0_and_1():
    dirs = np.array([[0, 0, -1.0], [1.0, 0, 0], [0, 1.0, 0]])
    sh = real_sh_matrix(dirs, 1)
    np.testing.assert_allclose(sh[:, 0], 1.0, atol=1e-12)  # W constant
    # ACN1 = Y (sin az * cos el), ACN2 = Z (sin el), ACN3 = X (cos az cos el)
    np.testing.assert_allclose(sh[0], [1, 0, 0, 1], atol=1e-9)  # front
    np.testing.assert_allclose(sh[2], [1, 0, 1, 0], atol=1e-9)  # up


def test_navgrid_pathfinding(rng):
    nav = NavGrid.rectangle(10.0, 8.0, resolution=0.25)
    start = np.array([1.0, 0.0, 1.0])
    end = np.array([9.0, 0.0, 7.0])
    path = nav.find_path(start, end)
    assert path is not None and len(path) >= 2
    # Endpoints snap near requested points
    assert np.linalg.norm(path[0][[0, 2]] - start[[0, 2]]) < 0.5
    assert np.linalg.norm(path[-1][[0, 2]] - end[[0, 2]]) < 0.5
    # Every waypoint navigable
    for p in path:
        assert nav.is_navigable(p)


def test_navgrid_snap_and_bounds():
    nav = NavGrid.rectangle(5.0, 4.0, resolution=0.25)
    snapped = nav.snap_point(np.array([-3.0, 0.0, -3.0]))
    assert not np.any(np.isnan(snapped))
    assert nav.is_navigable(snapped)
    lo, hi = nav.get_bounds()
    assert hi[0] - lo[0] == pytest.approx(5.0, abs=0.3)


def test_sample_trajectory_distance(rng):
    nav = NavGrid.rectangle(12.0, 10.0, resolution=0.25)
    traj = sample_trajectory(nav, rng, distance_threshold=5.0)
    span = np.hypot(
        traj[0][0] - traj[-1][0], traj[0][2] - traj[-1][2]
    )
    assert span >= 4.0  # threshold minus snap slack


def test_select_static_points_near_anchors(rng):
    nav = NavGrid.rectangle(12.0, 10.0, resolution=0.25)
    anchors = [np.array([6.0, 0.0, 5.0]), np.array([7.0, 0.0, 5.0])]
    pts = select_static_points(nav, anchors, rng, distance_threshold=6.0, num_points=2)
    assert len(pts) == 2
    for p in pts:
        assert any(np.hypot(p[0] - a[0], p[2] - a[2]) < 6.0 for a in anchors)


def test_grid_points_spacing(rng):
    nav = NavGrid.rectangle(6.0, 5.0, resolution=0.25)
    pts = generate_xy_grid_points(nav, 1.0)
    assert len(pts) > 4
    d = np.linalg.norm(pts[:, None] - pts[None, :], axis=-1)
    np.fill_diagonal(d, np.inf)
    assert d.min() >= 1.0 - 1e-6  # no two grid points closer than spacing


def test_image_source_counts():
    room = ShoeboxRoom((4.0, 3.0, 5.0))
    pos, hits = image_sources(room, np.array([1.0, 1.5, 2.0]), max_order=1)
    assert pos.shape == (6**3, 3)
    assert hits.min() == 0  # the direct source
    direct = pos[hits == 0]
    np.testing.assert_allclose(direct[0], [1.0, 1.5, 2.0])


def _onset(x, frac=0.5):
    """First sample reaching ``frac`` of the early maximum (robust vs
    coincident-reflection pileups later in the tail)."""
    a = np.abs(x)
    return int(np.argmax(a >= frac * a.max()))


def test_rir_direct_path_delay_and_decay():
    room = ShoeboxRoom((8.0, 3.0, 6.0), absorption=0.3)
    src = np.array([2.0, 1.1, 2.2])  # asymmetric: avoid coincident arrivals
    rcv = np.array([5.0, 1.4, 3.7])
    ch = ChannelModel("Mono")
    rir = render_shoebox_rir(room, src, rcv, ch, sample_rate=SR, seed=1)
    assert rir.shape[0] == 1
    d = np.linalg.norm(src - rcv)
    assert abs(_onset(rir[0]) - d / 343.0 * SR) < 6
    # Energy decays: last 10% has far less energy than the first 10%
    n = rir.shape[-1]
    head = np.sum(rir[0, : n // 10] ** 2)
    tail = np.sum(rir[0, -n // 10 :] ** 2)
    assert tail < head * 0.1


def test_rir_inverse_distance_amplitude():
    room = ShoeboxRoom((20.0, 10.0, 20.0), absorption=0.9)  # nearly anechoic
    ch = ChannelModel("Mono")
    src = np.array([10.0, 5.0, 10.0])
    r1 = render_shoebox_rir(room, src, np.array([11.0, 5.0, 10.0]), ch, SR, seed=2)
    r2 = render_shoebox_rir(room, src, np.array([12.0, 5.0, 10.0]), ch, SR, seed=2)
    a1, a2 = np.abs(r1).max(), np.abs(r2).max()
    assert a1 / a2 == pytest.approx(2.0, rel=0.15)  # 1/r law


def test_rir_binaural_itd():
    """Source to the left ⇒ left ear leads by up to ~2*r/c samples."""
    room = ShoeboxRoom((12.0, 3.0, 10.0), absorption=0.8)
    src = np.array([1.0, 1.5, 5.0])
    rcv = np.array([8.0, 1.5, 5.0])
    ch = ChannelModel("Binaural")
    # rotation 0 → ears along +/- x (left ear at -x, toward the source)
    rir = render_shoebox_rir(room, src, rcv, ch, SR, receiver_rotation=0.0, seed=3)
    itd = _onset(rir[1], 0.3) - _onset(rir[0], 0.3)
    assert 1 <= itd <= int(2 * 0.0875 / 343 * SR) + 2


def test_rir_ambisonics_w_xy():
    room = ShoeboxRoom((12.0, 3.0, 10.0), absorption=0.85)
    src = np.array([2.0, 1.5, 5.0])
    rcv = np.array([8.0, 1.5, 5.0])
    ch = ChannelModel("Ambisonics", channel_order=1)
    rir = render_shoebox_rir(room, src, rcv, ch, SR, receiver_rotation=0.0, seed=4)
    assert rir.shape[0] == 4
    d = np.argmax(np.abs(rir[0]))
    # W and the direct arrival in X/Y consistent with direction (-x):
    # azimuth convention: az = atan2(-dx, -dz); source at -x → az = +90°,
    # so ACN1 (sin az) ≈ +W, ACN3 (cos az) ≈ 0.
    assert abs(rir[1, d] - rir[0, d]) < 0.35 * abs(rir[0, d])
    assert abs(rir[3, d]) < 0.35 * abs(rir[0, d])


def test_render_bank_shape_and_norm(rng):
    scene = Scene.synthetic(dims=(8.0, 3.0, 6.0), channel_type="Mono", seed=5)
    srcs = [np.array([2.0, 0.0, 2.0]), np.array([4.0, 0.0, 3.0])]
    mics = [np.array([5.0, 0.0, 4.0])]
    bank = scene.render_bank(srcs, mics)
    assert bank.ndim == 4 and bank.shape[:3] == (2, 1, 1)
    assert np.abs(bank).max() == pytest.approx(1.0)  # peak-normalized


def test_custom_array_channels():
    scene = Scene.synthetic(
        dims=(8.0, 3.0, 6.0),
        channel_type="CustomArrayIR",
        mic_array=[[0, 0, -0.035], [0.035, 0, 0], [0, 0, 0.035], [-0.035, 0, 0]],
        seed=6,
    )
    rir = scene.render_ir(np.array([2.0, 0.0, 2.0]), np.array([6.0, 0.0, 4.0]))
    assert rir.shape[0] == 4
    # Mic positions differ → channels are distinct but correlated
    c01 = np.corrcoef(rir[0], rir[1])[0, 1]
    assert 0.2 < c01 < 0.999999


def test_bank_oracle_roundtrip(tmp_path, rng):
    scene = Scene.synthetic(dims=(6.0, 3.0, 5.0), channel_type="Mono", seed=7)
    srcs = np.array([[1.0, 1.5, 1.0], [3.0, 1.5, 2.0]])
    rcvs = np.array([[4.0, 1.5, 3.0]])
    bank = render_rir_bank(
        scene.oracle, list(srcs), list(rcvs), scene.channel
    )
    save_rir_bank(tmp_path / "bank.npz", bank, srcs, rcvs, SR)
    oracle = BankRirOracle(tmp_path / "bank.npz")
    got = oracle.render(srcs[1], rcvs[0], scene.channel)
    np.testing.assert_allclose(got, bank[1, 0], atol=1e-7)
    # float16 banks (the generation pipeline's save format) round-trip
    # with the stored dtype and load as f32 for downstream math.
    save_rir_bank(
        tmp_path / "bank16.npz", np.asarray(bank, np.float16), srcs, rcvs, SR
    )
    o16 = BankRirOracle(tmp_path / "bank16.npz")
    got16 = o16.render(srcs[1], rcvs[0], scene.channel)
    assert got16.dtype == np.float32
    np.testing.assert_allclose(got16, bank[1, 0], atol=2e-3)


def test_trace_image(tmp_path, rng):
    scene = Scene.synthetic(dims=(10.0, 3.0, 8.0), seed=8)
    traj = scene.sample_trajectory(rng)
    from sonicsim_tpu.sim import save_trace_image

    save_trace_image(
        tmp_path / "trace.png",
        scene.nav,
        trajectories=[np.stack(traj)],
        mic_points=np.array([[5.0, 0.0, 4.0]]),
        meters_per_pixel=0.2,
    )
    # decodes as an image and actually contains the drawn markers
    from PIL import Image

    img = np.asarray(Image.open(tmp_path / "trace.png").convert("RGB"))
    assert img.shape[0] > 50 and img.shape[1] > 50
    # trajectory color (tab:red) and mic marker (gold) both present
    assert (np.abs(img.astype(int) - [214, 39, 40]).sum(-1) < 30).any()
    assert (np.abs(img.astype(int) - [255, 215, 0]).sum(-1) < 30).any()


def test_trace_gif(tmp_path, rng):
    """save_trace_gif (SonicSim_rir.py:990-1020 parity): animated GIF
    with one frame per waypoint, speakers highlighted per frame."""
    scene = Scene.synthetic(dims=(10.0, 3.0, 8.0), seed=8)
    traj = scene.sample_trajectory(rng)
    from sonicsim_tpu.sim import save_trace_gif

    save_trace_gif(
        tmp_path / "trace.gif",
        scene.nav,
        trajectories=[np.stack(traj)],
        mic_points=np.array([[5.0, 0.0, 4.0]]),
        meters_per_pixel=0.2,
    )
    from PIL import Image

    img = Image.open(tmp_path / "trace.gif")
    assert getattr(img, "n_frames", 1) == len(traj)
    img.seek(len(traj) - 1)  # every frame decodes
    frame = np.asarray(img.convert("RGB"))
    assert (np.abs(frame.astype(int) - [214, 39, 40]).sum(-1) < 30).any()


def test_native_pathfinding_matches_python_contract(rng):
    """Native A* (when built) must produce navigable simplified paths."""
    from sonicsim_tpu import native

    nav = NavGrid.rectangle(12.0, 10.0, resolution=0.25)
    path = nav.find_path(np.array([1.0, 0, 1.0]), np.array([11.0, 0, 9.0]))
    assert path is not None and len(path) >= 2
    for p in path:
        assert nav.is_navigable(p)
    if native.available():
        cells = native.astar_path(nav.occupancy, (4, 4), (40, 36))
        assert cells is not None
        assert tuple(cells[0]) == (4, 4) and tuple(cells[-1]) == (40, 36)


def test_multiband_rir_frequency_dependence():
    """High-frequency-absorbing room: HF decays faster than LF."""
    room = ShoeboxRoom(
        (8.0, 3.0, 6.0), absorption=0.3,
        absorption_bands=(0.05, 0.1, 0.3, 0.6, 0.8),
    )
    from sonicsim_tpu.sim import render_shoebox_rir_multiband

    rir = render_shoebox_rir_multiband(
        room, np.array([2.0, 1.1, 2.2]), np.array([5.0, 1.4, 3.7]),
        ChannelModel("Mono"), room.band_absorption(32), sample_rate=SR, seed=3,
    )
    assert rir.shape[0] == 1 and np.isfinite(rir).all()
    x = rir[0]
    n = len(x)
    # Compare low vs high band energy decay between early and late halves.
    spec_early = np.abs(np.fft.rfft(x[: n // 3]))
    spec_late = np.abs(np.fft.rfft(x[-n // 3 :], n // 3))
    freqs_e = np.fft.rfftfreq(n // 3, 1 / SR)
    lo = freqs_e < 500
    hi = freqs_e > 4000
    decay_lo = spec_late[lo].mean() / (spec_early[lo].mean() + 1e-12)
    decay_hi = spec_late[hi].mean() / (spec_early[hi].mean() + 1e-12)
    assert decay_hi < decay_lo  # HF dies faster


def test_multiband_oracle_in_scene():
    scene = Scene.synthetic(dims=(8.0, 3.0, 6.0), channel_type="Mono", seed=9, max_order=2)
    scene.oracle.n_bands = 8
    rir = scene.render_ir(np.array([2.0, 0.0, 2.0]), np.array([6.0, 0.0, 4.0]))
    assert rir.ndim == 2 and np.isfinite(rir).all()


def test_scene_generate_data():
    import numpy as np

    from sonicsim_tpu.sim.scene import Scene

    scene = Scene.synthetic(resolution=0.5, max_order=2)
    rng = np.random.default_rng(0)
    srcs = [np.array([2.0, 0.0, 2.0]), np.array([6.0, 0.0, 5.0])]
    recv = np.array([4.0, 0.0, 4.0])
    dry = [rng.standard_normal(8000).astype(np.float32) * 0.1 for _ in srcs]

    out = scene.generate_data(srcs, recv, dry_sounds=dry, use_dry_sound=True)
    assert len(out["ir_list"]) == 2
    assert out["ir_list"][0].shape[0] == 2  # binaural
    assert out["sample_rate"] == 16000
    assert out["envmap"] == [None, None]
    assert len(out["audio_list"]) == 2
    a = out["audio_list"][0]
    assert a.shape[0] == 2 and a.shape[-1] >= 8000
    assert np.isfinite(a).all() and np.abs(a).max() > 0

    # without dry sound: IRs only
    out2 = scene.generate_data(srcs, recv)
    assert out2["audio_list"] == [] and len(out2["ir_list"]) == 2


def test_render_custom_arrayir():
    import numpy as np

    from sonicsim_tpu.sim.scene import Scene

    scene = Scene.synthetic(resolution=0.5, max_order=2)
    mics = [(0.1, 0.0, 0.0), (-0.1, 0.0, 0.0), (0.0, 0.0, 0.1)]
    ir = scene.render_custom_arrayir(
        np.array([2.0, 0.0, 2.0]), np.array([5.0, 0.0, 4.0]), mics
    )
    assert ir.shape[0] == 3
    assert np.isfinite(ir).all() and np.abs(ir).max() > 0
    # mic offsets change arrival: channels must differ
    assert not np.allclose(ir[0], ir[1])


def test_interpolate_receiver_poses():
    import numpy as np

    from sonicsim_tpu.sim.geometry import interpolate_receiver_poses

    pos = np.stack([np.zeros(3), np.ones(3) * 4.0])
    rot = [0.0, 40.0]
    poses = interpolate_receiver_poses(pos, rot, 8)
    assert len(poses) == 8
    np.testing.assert_allclose(poses[0][0], np.zeros(3))  # starts at waypoint 0
    assert poses[0][1] == 0.0
    # monotone progress toward the next waypoint
    d = [np.linalg.norm(p) for p, _ in poses]
    assert all(b >= a for a, b in zip(d, d[1:]))
    assert poses[-1][1] < 40.0  # endpoint excluded (linspace endpoint=False)


def test_python_fallback_matches_native_multiband(monkeypatch):
    """The pure-python image-source fallback must agree with the native
    enumeration: same validity window (d <= maxd, d >= 1e-6, no distance
    clamp) and per-band amplitudes."""
    import sonicsim_tpu.native as native
    from sonicsim_tpu.sim import render_shoebox_rir_multiband

    room = ShoeboxRoom((8.0, 3.0, 6.0), absorption=0.3)
    src = np.array([2.0, 1.1, 2.2])
    # Receiver 0.5 mm from the source: exercises the old fallback's 1e-3
    # distance clamp, which diverged ~2x from the native amplitude.
    for recv in (np.array([5.0, 1.4, 3.7]), src + np.array([5e-4, 0.0, 0.0])):
        kw = dict(
            channel=ChannelModel("Mono"),
            band_absorption=room.band_absorption(8),
            sample_rate=SR, seed=3, max_order=2,
        )
        ref = render_shoebox_rir_multiband(room, src, recv, **kw)
        if ref is None:
            pytest.skip("native library unavailable")
        with monkeypatch.context() as m:
            m.setattr(native, "image_sources_multiband",
                      lambda *a, **k: None)
            got = render_shoebox_rir_multiband(room, src, recv, **kw)
        np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-7)


def test_densify_path_arc_length():
    """densify_path resamples by uniform arc length, preserves endpoints,
    and leaves already-dense or degenerate paths untouched."""
    from sonicsim_tpu.sim.geometry import densify_path

    path = [np.array([0.0, 0.0, 0.0]), np.array([3.0, 0.0, 0.0]),
            np.array([3.0, 0.0, 4.0])]  # two legs: 3 m + 4 m
    out = densify_path(path, 8)
    assert len(out) == 8
    np.testing.assert_allclose(out[0], path[0])
    np.testing.assert_allclose(out[-1], path[-1])
    # uniform spacing along the 7 m polyline: every step = 1 m
    steps = [np.linalg.norm(b - a) for a, b in zip(out, out[1:])]
    np.testing.assert_allclose(steps, 1.0, atol=1e-9)
    # the corner itself lies on the polyline (x<=3, then z grows)
    for p in out:
        assert p[0] <= 3.0 + 1e-9
    # already dense / degenerate inputs pass through unchanged
    assert len(densify_path(path, 3)) == 3
    assert len(densify_path([path[0]], 5)) == 1
    same = [np.zeros(3), np.zeros(3)]
    assert len(densify_path(same, 5)) == 2
