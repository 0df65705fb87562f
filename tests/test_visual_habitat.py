"""Visual data path + live habitat adapter plumbing (mock-based).

The habitat tests drive HabitatRirOracle/habitat_render_fn through a fake
habitat_sim module recording every call, validating the pose/config flow of
SonicSim_rir.py:214-514 without the real simulator. The visual frame tests
run the hermetic top-down renderer for real.
"""

import math
import types

import numpy as np
import pytest

from sonicsim_tpu.sim.channels import ChannelModel
from sonicsim_tpu.sim.geometry import NavGrid
from sonicsim_tpu.sim.oracle import ACOUSTIC_CONFIG, HabitatRirOracle
from sonicsim_tpu.sim.visual import (
    habitat_render_fn,
    interpolate_rgb_images,
    render_envmap,
    topdown_render_fn,
)


class _Attr:
    """Attribute sink (records arbitrary attribute writes)."""

    def __init__(self):
        self.__dict__["set"] = {}

    def __setattr__(self, k, v):
        self.__dict__["set"][k] = v

    def __getattr__(self, k):
        return self.__dict__["set"].setdefault(k, _Attr())


class _FakeAgentState:
    def __init__(self):
        self.position = None
        self.rotation = None
        self.sensor_states = {"stale": 1}


class _FakeSensor:
    def __init__(self, log):
        self.log = log

    def setAudioMaterialsJSON(self, path):
        self.log.append(("materials", path))

    def setAudioSourceTransform(self, pos):
        self.log.append(("source", np.asarray(pos).copy()))


class _FakeAgent:
    def __init__(self, log):
        self.log = log
        self._sensors = {"audio_sensor": _FakeSensor(log)}
        self._state = _FakeAgentState()

    def get_state(self):
        return self._state

    def set_state(self, state, reset):
        self.log.append(("agent_state", np.asarray(state.position).copy(),
                         state.rotation, dict(state.sensor_states), reset))


class _FakeSim:
    def __init__(self, cfg, log, n_channels=2, frame=None):
        self.log = log
        self._agent = _FakeAgent(log)
        self.pathfinder = types.SimpleNamespace(
            load_nav_mesh=lambda p: log.append(("navmesh", p))
        )
        self._n = n_channels
        self._frame = frame

    def seed(self, s):
        self.log.append(("seed", s))

    def add_sensor(self, spec):
        self.log.append(("add_sensor", spec))

    def get_agent(self, i):
        return self._agent

    def get_sensor_observations(self):
        obs = {"audio_sensor": np.ones((self._n, 64), np.float32)}
        if self._frame is not None:
            obs["color_sensor"] = self._frame
            obs["depth_sensor"] = self._frame[..., 0].astype(np.float32)
        return obs

    def close(self):
        self.log.append(("close",))


def _fake_habitat(log, n_channels=2):
    hs = types.SimpleNamespace()
    hs.SimulatorConfiguration = _Attr
    hs.agent = types.SimpleNamespace(AgentConfiguration=_Attr)
    hs.Configuration = lambda b, a: ("cfg", b, a)
    hs.Simulator = lambda cfg: _FakeSim(cfg, log, n_channels)
    hs.AudioSensorSpec = _Attr
    hs.sensor = types.SimpleNamespace(
        RLRAudioPropagationChannelLayoutType=types.SimpleNamespace(
            Mono="MONO", Binaural="BINAURAL", Ambisonics="AMBISONICS"
        )
    )
    hs.utils = types.SimpleNamespace(
        common=types.SimpleNamespace(
            quat_from_angle_axis=lambda rad, axis: ("quat", rad, tuple(axis))
        )
    )
    return hs


def test_habitat_oracle_construction_plumbing():
    log = []
    channel = ChannelModel("Binaural")
    oracle = HabitatRirOracle(
        "scene.glb", navmesh="room.navmesh", material_json="mat.json",
        channel=channel, sample_rate=16000, seed=7,
        habitat=_fake_habitat(log),
    )
    assert ("navmesh", "room.navmesh") in log
    assert ("seed", 7) in log
    assert ("materials", "mat.json") in log
    spec = next(e[1] for e in log if e[0] == "add_sensor")
    assert spec.set["uuid"] == "audio_sensor"
    assert spec.set["enableMaterials"] is True
    assert spec.set["position"] == [0.0, 1.5, 0.0]
    layout = spec.set["channelLayout"].set
    assert layout["type"] == "BINAURAL" and layout["channelCount"] == 2
    ac = spec.set["acousticsConfig"].set
    for key in ("direct", "indirect", "diffraction", "transmission",
                "directSHOrder", "indirectSHOrder", "frequencyBands",
                "indirectRayCount"):
        assert ac[key.replace("sampleRate", "sampleRate")] == ACOUSTIC_CONFIG[key]
    assert ac["sampleRate"] == 16000
    oracle.close()
    assert ("close",) in log


def test_habitat_oracle_render_poses_and_returns_ir():
    log = []
    channel = ChannelModel("Binaural")
    oracle = HabitatRirOracle(
        "scene.glb", channel=channel, habitat=_fake_habitat(log)
    )
    src = np.array([1.0, 0.0, 2.0])
    recv = np.array([3.0, 0.0, 4.0])
    ir = oracle.render(src, recv, channel, receiver_rotation=45.0)
    assert ir.shape == (2, 64) and ir.dtype == np.float32

    kind, pos, rot, sensor_states, reset = next(
        e for e in log if e[0] == "agent_state"
    )
    np.testing.assert_allclose(pos, recv)
    assert rot == ("quat", math.radians(45.0), (0.0, 1.0, 0.0))
    assert sensor_states == {} and reset is True
    # Source transform carries the sensor-height offset (rir.py:411-413).
    _, src_pos = next(e for e in log if e[0] == "source")
    np.testing.assert_allclose(src_pos, src + np.array([0.0, 1.5, 0.0]))


def test_habitat_oracle_channel_mismatch():
    log = []
    channel = ChannelModel("Mono")
    oracle = HabitatRirOracle(
        "scene.glb", channel=channel, habitat=_fake_habitat(log, n_channels=4)
    )
    with pytest.raises(ValueError, match="channels"):
        oracle.render(np.zeros(3), np.ones(3), channel)


def test_interpolate_rgb_images_topdown():
    nav = NavGrid.rectangle(6.0, 4.0, resolution=0.1)
    render = topdown_render_fn(nav)
    waypoints = np.array([[1.0, 0.0, 1.0], [5.0, 0.0, 1.0], [5.0, 0.0, 3.0]])
    rotations = [0.0, 90.0, 180.0]
    frames = interpolate_rgb_images(render, waypoints, rotations, video_len=12)
    assert len(frames) == 12
    assert frames[0].ndim == 3 and frames[0].shape[-1] == 3
    assert frames[0].dtype == np.uint8
    # The receiver marker moves: first and last frames differ.
    assert (frames[0] != frames[-1]).any()
    # All frames share the raster extent.
    assert len({f.shape for f in frames}) == 1


def test_render_envmap_panorama():
    nav = NavGrid.rectangle(6.0, 4.0, resolution=0.1)
    render = topdown_render_fn(nav)
    single, depth_single = render(np.array([2.0, 0.0, 2.0]), 0.0)
    rgb, depth = render_envmap(render, np.array([2.0, 0.0, 2.0]), 30.0)
    assert rgb.shape == (single.shape[0], 4 * single.shape[1], 3)
    assert depth.shape == (single.shape[0], 4 * single.shape[1])


def test_habitat_render_fn_mock():
    log = []
    frame = np.full((8, 10, 4), 7, np.uint8)
    hs = _fake_habitat(log)
    sim = _FakeSim(None, log, frame=frame)
    render = habitat_render_fn(sim, habitat=hs)
    rgb, depth = render(np.array([1.0, 0.0, 2.0]), 90.0)
    assert rgb.shape == (8, 10, 4)
    assert depth.shape == (8, 10)
    kind, pos, rot, *_ = next(e for e in log if e[0] == "agent_state")
    np.testing.assert_allclose(pos, [1.0, 0.0, 2.0])
    assert rot == ("quat", math.radians(90.0), (0.0, 1.0, 0.0))

    frames = interpolate_rgb_images(
        render, np.array([[0.0, 0, 0], [1.0, 0, 1.0]]), [0.0, 90.0], 5
    )
    assert len(frames) == 5 and frames[0].shape == (8, 10, 3)
