"""Full material physics: scattering, transmission, damping, diffraction.

The reference's tracer runs with direct + indirect + DIFFRACTION +
TRANSMISSION enabled (SonicSim_rir.py:176-187) and its 30 materials carry
absorption/scattering/transmission/damping curves
(SonicSet/material/mp3d_material_config.json). These tests pin the shoebox
oracle's counterparts (ShoeboxRoom.wall_physics, image_source renderers,
bank_render) — the energy bookkeeping, the decay model, the early/late
re-balance scattering causes, and the LF-weighted edge-diffraction term —
plus bank-vs-serial parity with every family switched on at once.
"""

import json
from pathlib import Path

import numpy as np
import pytest

from sonicsim_tpu.sim.bank_render import render_bank_batched
from sonicsim_tpu.sim.channels import ChannelModel
from sonicsim_tpu.sim.image_source import (
    ShoeboxRoom,
    band_centers,
    diffraction_band_gain,
    edge_diffraction_paths,
    render_shoebox_rir_multiband,
)
from sonicsim_tpu.sim.materials import (
    Material,
    _curve_values,
    load_material_config,
    wall_curves_from_labels,
)
from sonicsim_tpu.sim.oracle import SyntheticRirOracle

DIMS = (6.0, 3.0, 5.0)
SRC = np.array([1.5, 1.4, 1.5])
RECV = np.array([4.0, 1.6, 3.2])
SR = 16000
REF_MP3D = Path(
    "/root/reference/SonicSim-SonicSet/SonicSet/material/"
    "mp3d_material_config.json"
)


# ---------------------------------------------------------------- tables ---


def test_wall_physics_energy_identities():
    """β_spec² + reflected·s == β_tot² == 1−α−τ per band per wall."""
    room = ShoeboxRoom(
        DIMS,
        wall_absorption_bands=tuple((0.1, 0.3) for _ in range(6)),
        wall_scattering_bands=tuple((0.2, 0.5) for _ in range(6)),
        wall_transmission_bands=tuple((0.05, 0.1) for _ in range(6)),
    )
    p = room.wall_physics(8)
    refl = 1.0 - p.alpha - p.transmission
    np.testing.assert_allclose(p.beta_total**2, refl, rtol=1e-12)
    np.testing.assert_allclose(
        p.beta_spec**2 + refl * p.scattering, p.beta_total**2, rtol=1e-12
    )


def test_transmission_equivalent_absorption_for_decay():
    """(α=0.2, τ=0.2) and (α=0.4, τ=0) reflect identically and decay
    identically — transmission attenuates (doesn't zero) and drains."""
    a = ShoeboxRoom(DIMS, absorption=0.2, transmission=0.2).wall_physics(8)
    b = ShoeboxRoom(DIMS, absorption=0.4).wall_physics(8)
    np.testing.assert_allclose(a.beta_spec, b.beta_spec, rtol=1e-12)
    np.testing.assert_allclose(a.rt60_bands, b.rt60_bands, rtol=1e-12)
    # And adding transmission to fixed absorption attenuates + shortens.
    c = ShoeboxRoom(DIMS, absorption=0.2).wall_physics(8)
    assert np.all(a.beta_spec < c.beta_spec)
    assert np.all(a.rt60_bands < c.rt60_bands)
    assert np.all(a.beta_spec > 0)  # attenuate, don't zero


def test_damping_shortens_rt60_hf_more():
    """Medium damping adds the 4mV Eyring term; a rising HF curve must
    shorten high bands proportionally more than low bands."""
    base = ShoeboxRoom(DIMS, absorption=0.2).wall_physics(16)
    damped = ShoeboxRoom(
        DIMS,
        absorption=0.2,
        wall_damping_bands=tuple(
            tuple(np.linspace(0.0, 0.05, 16)) for _ in range(6)
        ),
    ).wall_physics(16)
    ratio = damped.rt60_bands / base.rt60_bands
    assert ratio[0] == pytest.approx(1.0, abs=1e-9)  # zero damping at LF
    assert np.all(np.diff(ratio) <= 1e-12)  # monotone shrink with freq
    assert ratio[-1] < 0.9


def test_is_uniform_accounts_all_families():
    room = ShoeboxRoom(DIMS, wall_scattering_bands=((0.1,),) * 6)
    assert room.is_uniform
    room2 = ShoeboxRoom(
        DIMS, wall_scattering_bands=((0.1,),) * 5 + ((0.4,),)
    )
    assert not room2.is_uniform


# ------------------------------------------------------------- rendering ---


def _render(room, channel=None, **kw):
    channel = channel or ChannelModel("Mono")
    return render_shoebox_rir_multiband(
        room, SRC, RECV, channel, sample_rate=SR, seed=3,
        ir_seconds=0.5, n_bands=16, **kw,
    )


def test_scattering_diverts_energy_specular_to_diffuse(monkeypatch):
    """Scattering's diffuse split, measured at the mechanism: rendering
    with the tail-noise stream zeroed isolates the SPECULAR component, so
    E_diffuse = E_full − E_spec. As s rises the specular energy must fall
    monotonically and the diffuse energy must rise monotonically — the
    early/late re-balance the reference's scattering coefficients drive
    (mp3d_material_config.json). The injected amount follows the
    INCOHERENT Σamp² budget (see render_shoebox_rir_multiband): the
    diffuse field is incoherent by definition, which is also why it
    cannot (and should not) reproduce the specular train's coherent LF
    buildup."""
    import jax.numpy as jnp

    import sonicsim_tpu.sim.image_source as iso

    e_spec, e_diff = [], []
    for s in (0.0, 0.4, 0.8):
        room = ShoeboxRoom(
            DIMS, absorption=0.15, scattering=s, diffraction=False
        )
        full = _render(room)[0]
        monkeypatch.setattr(
            iso, "tail_noise",
            lambda seed, c, L: jnp.zeros((L,), jnp.float32),
        )
        spec = _render(room)[0]
        monkeypatch.undo()
        e_spec.append(float(np.sum(spec**2)))
        e_diff.append(float(np.sum(full**2) - np.sum(spec**2)))
    assert e_spec[0] > e_spec[1] > e_spec[2]
    assert e_diff[0] < e_diff[1] < e_diff[2]
    # Strong scattering moves the balance decisively: diffuse goes from
    # a small correction to the dominant late-field component.
    assert e_diff[0] < 0.2 * e_spec[0]
    assert e_diff[2] > 1.0 * e_spec[2]


def test_diffraction_term_is_lf_weighted():
    """The edge term must (a) change the RIR, (b) put its energy
    predominantly below ~1 kHz (Maekawa attenuation grows with the
    Fresnel number ∝ f)."""
    kw = dict(absorption=0.8, scattering=0.0)
    ir_on = _render(ShoeboxRoom(DIMS, diffraction=True, **kw))[0]
    ir_off = _render(ShoeboxRoom(DIMS, diffraction=False, **kw))[0]
    diff = ir_on - ir_off
    assert np.max(np.abs(diff)) > 1e-6
    spec = np.abs(np.fft.rfft(diff)) ** 2
    freqs = np.fft.rfftfreq(len(diff), 1.0 / SR)
    lf = float(spec[(freqs > 50) & (freqs < 1000)].mean())
    hf = float(spec[freqs > 4000].mean())
    assert lf > 5.0 * hf


def test_edge_paths_match_brute_force():
    rng = np.random.default_rng(0)
    for _ in range(5):
        s = rng.uniform(0.3, 2.7, 3) * np.array(DIMS) / 3.0
        r = rng.uniform(0.3, 2.7, 3) * np.array(DIMS) / 3.0
        paths, points = edge_diffraction_paths(DIMS, s, r)
        # Brute force: sample each edge densely.
        e = 0
        for f in range(3):
            a, b = [ax for ax in range(3) if ax != f]
            for wa in (0.0, DIMS[a]):
                for wb in (0.0, DIMS[b]):
                    t = np.linspace(0.0, DIMS[f], 4001)
                    pt = np.zeros((len(t), 3))
                    pt[:, f], pt[:, a], pt[:, b] = t, wa, wb
                    brute = (
                        np.linalg.norm(pt - s, axis=1)
                        + np.linalg.norm(pt - r, axis=1)
                    ).min()
                    assert paths[e] == pytest.approx(brute, abs=1e-5)
                    e += 1


def test_diffraction_gain_monotone():
    freqs = band_centers(16, SR)
    g = diffraction_band_gain(np.array([[0.5]]), freqs[None, :])[0]
    assert np.all(np.diff(g) < 0)  # attenuates more at HF
    assert diffraction_band_gain(np.zeros((1, 1)), freqs[None, :]).max() \
        == pytest.approx(1 / np.sqrt(3))


# ------------------------------------------------- bank/serial parity ------


@pytest.mark.parametrize("channel_type", ["Mono", "Binaural"])
def test_bank_matches_serial_full_physics(channel_type):
    """The batched bank renderer and the serial oracle must agree with
    EVERY family active at once: per-wall banded absorption + scattering
    + transmission + damping, diffraction on."""
    room = ShoeboxRoom(
        DIMS,
        wall_absorption_bands=(
            (0.45, 0.3), (0.05, 0.08), (0.05, 0.1),
            (0.12, 0.2), (0.04, 0.05), (0.55, 0.4),
        ),
        wall_scattering_bands=tuple((0.1, 0.4) for _ in range(6)),
        wall_transmission_bands=(
            (0.0, 0.0), (0.1, 0.05), (0.0, 0.0),
            (0.0, 0.0), (0.15, 0.2), (0.0, 0.0),
        ),
        wall_damping_bands=tuple((0.0, 0.02) for _ in range(6)),
        diffraction=True,
    )
    oracle = SyntheticRirOracle(
        room=room, sample_rate=SR, max_order=2, seed=11, n_bands=8,
        ir_seconds=0.4,
    )
    channel = ChannelModel(channel_type)
    srcs = [SRC, np.array([2.5, 1.2, 2.0])]
    recvs = [RECV]
    rows = [[oracle.render(s, r, channel) for r in recvs] for s in srcs]
    expected = np.stack([np.stack(row) for row in rows]).astype(np.float32)
    peak = np.abs(expected).max()
    expected = expected / peak if peak > 0 else expected
    bank = render_bank_batched(oracle, srcs, recvs, channel)
    scale = np.abs(expected).max()
    np.testing.assert_allclose(bank, expected, rtol=1e-3, atol=5e-5 * scale)


def test_transmission_absorption_equivalence_end_to_end():
    """(α=0.2, τ=0.2) and (α=0.4, τ=0) give IDENTICAL β tables and decay
    — so the rendered RIRs must match exactly (same tail seeds). Pins the
    attenuate-don't-zero semantics at the waveform level."""
    ch = ChannelModel("Mono")
    a = SyntheticRirOracle(
        ShoeboxRoom(DIMS, absorption=0.2, transmission=0.2, scattering=0.1),
        sample_rate=SR, max_order=2, seed=5, n_bands=8, ir_seconds=0.3,
    ).render(SRC, RECV, ch)
    b = SyntheticRirOracle(
        ShoeboxRoom(DIMS, absorption=0.4, scattering=0.1),
        sample_rate=SR, max_order=2, seed=5, n_bands=8, ir_seconds=0.3,
    ).render(SRC, RECV, ch)
    np.testing.assert_allclose(a, b, rtol=0, atol=1e-7)


# ------------------------------------------------------- material parsing --


def test_interleaved_pair_parsing():
    vals, freqs = _curve_values([125.0, 0.02, 250.0, 0.03, 4000.0, 0.5])
    assert vals == [0.02, 0.03, 0.5]
    assert freqs == [125.0, 250.0, 4000.0]
    # Plain value lists (no plausible frequency axis) stay values.
    vals2, freqs2 = _curve_values([0.1, 0.2, 0.3])
    assert vals2 == [0.1, 0.2, 0.3] and freqs2 is None


def test_curve_at_log_interp_and_clamp():
    m = Material(
        "x", absorption=[0.1, 0.4], freqs={"absorption": [125.0, 4000.0]}
    )
    q = m.curve_at("absorption", np.array([60.0, 125.0, 4000.0, 8000.0]))
    assert q[0] == pytest.approx(0.1)  # flat extrapolation below
    assert q[-1] == pytest.approx(0.4)  # and above
    mid = m.curve_at("absorption", np.array([np.sqrt(125.0 * 4000.0)]))
    assert mid[0] == pytest.approx(0.25, abs=1e-6)  # log-midpoint


def test_wall_curves_from_labels_builds_full_room():
    out = wall_curves_from_labels(
        {"floor": "carpet", "ceiling": "concrete", "walls": "glass"},
        n_bands=8, sample_rate=SR,
    )
    assert set(out) == {
        "wall_absorption_bands", "wall_scattering_bands",
        "wall_transmission_bands", "wall_damping_bands",
    }
    room = ShoeboxRoom(DIMS, **out)
    p = room.wall_physics(8)
    # glass (x0 wall) transmits; carpet floor (y0, index 2) does not.
    assert p.transmission[:, 0].max() > 0.05
    assert p.transmission[:, 2].max() == pytest.approx(0.0, abs=1e-12)


@pytest.mark.skipif(not REF_MP3D.exists(), reason="reference assets absent")
def test_reference_mp3d_config_parses_with_frequency_axes():
    """The actual reference JSON stores curves as interleaved
    [freq, value, ...] pairs — every family must come back with a
    frequency axis and plausible ranges, and a Material must feed a
    renderable room."""
    mats = load_material_config(REF_MP3D)
    assert len(mats) >= 20
    with_freq = [
        m for m in mats.values() if "absorption" in m.freqs
    ]
    assert len(with_freq) >= 20
    for m in mats.values():
        assert all(0.0 <= v <= 1.0 for v in m.absorption)
        assert all(0.0 <= v <= 1.0 for v in m.scattering)
        assert all(0.0 <= v <= 1.0 for v in m.transmission)
        assert all(0.0 <= v <= 0.5 for v in m.damping)
    # Brick at low vs high frequency: absorption should differ (banded).
    any_banded = any(
        max(m.absorption) - min(m.absorption) > 0.05 for m in mats.values()
    )
    assert any_banded
    curves = wall_curves_from_labels(
        [next(iter(mats))] * 6, mats, n_bands=8, sample_rate=SR
    )
    ShoeboxRoom(DIMS, **curves).wall_physics(8)
