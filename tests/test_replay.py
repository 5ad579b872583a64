"""Replay-buffer + host-actor tests using a fake in-process environment
(the reference's pattern of testing the learner against a fake world,
SURVEY §4.3)."""

import time

import jax
import numpy as np
import pytest

from scmgan_tpu.data.replay import (
    HostActor,
    HostReplayDatasource,
    ReplayBuffer,
)


class FakeEnv:
    """Tiny deterministic episode generator standing in for ALE/SC2."""

    class _Space:
        def __init__(self, n):
            self.n = n

        def sample(self):
            return np.random.randint(self.n)

    def __init__(self, episode_len=6):
        self.action_space = self._Space(3)
        self.episode_len = episode_len
        self.t = 0
        self.closed = False

    def reset(self):
        self.t = 0
        # CHW frames — the storage convention (reference convert_frame
        # transposes to channels-first, envs/minipacman.py:167-168)
        return np.full((2, 4, 4), self.t, np.float32)

    def step(self, action):
        self.t += 1
        done = self.t >= self.episode_len
        obs = np.full((2, 4, 4), self.t, np.float32)
        return obs, float(action), done, {}

    def close(self):
        self.closed = True


def test_replay_buffer_split_and_reservoir():
    buf = ReplayBuffer(capacity=5, test_holdout=0.5, seed=0)
    for i in range(40):
        buf.add((np.full(3, i), np.zeros(3), np.zeros(3)))
    assert buf.size(True) <= 5 and buf.size(False) <= 5
    assert buf.size(True) + buf.size(False) == 10
    ep = buf.sample_episode(True)
    assert len(ep) == 3


def test_host_actor_fills_buffer():
    buf = ReplayBuffer(capacity=10, test_holdout=0.0, seed=0)
    actor = HostActor(FakeEnv, buf, num_rewards=2, max_trajectory_len=8)
    actor.start()
    try:
        deadline = time.time() + 10
        while len(buf) < 2 and time.time() < deadline:
            time.sleep(0.05)
        assert len(buf) >= 2
        assert actor.is_alive()
        states, rewards, actions = buf.sample_episode(True)
        assert states.shape[1:] == (2, 4, 4)
        assert rewards.shape[1] == 2  # pos/neg split for scalar rewards
        # first recorded reward is the pre-step zero (reference
        # envs/minipacman.py:95-108 records reward lagged by one step)
        np.testing.assert_array_equal(rewards[0], [0.0, 0.0])
    finally:
        # a leaked daemon actor keeps allocating for the whole remaining
        # pytest session and has segfaulted a later XLA CPU compile
        actor.stop()


def test_host_replay_datasource_contract():
    ds = HostReplayDatasource(
        FakeEnv, num_actions=3, num_rewards=2, channels=2,
        min_buffer_len=2, max_trajectory_len=8, seed=0)
    try:
        states, rewards, dones, actions = ds.get_trajectories(
            batch_size=3, timesteps=10)
        assert states.shape[0] == 3 and states.shape[1] == 10
        assert rewards.shape == (3, 10, 2)
        assert dones.shape == (3, 10)
        # clip joins carry synthetic dones (episodes are 8 steps < 10)
        assert dones.any(axis=1).all()
        obs, rew, dn, act = ds.collect(2, 6)
        assert obs.shape[0] == 2 and obs.shape[1] == 6
        assert obs.shape[-1] == 2  # NHWC channels last
    finally:
        ds.close()


def test_actor_death_detected():
    class CrashingEnv(FakeEnv):
        def reset(self):
            raise RuntimeError("emulator exploded")

    ds = HostReplayDatasource(
        CrashingEnv, num_actions=3, num_rewards=1, channels=2,
        min_buffer_len=1, seed=0)
    try:
        with pytest.raises(RuntimeError, match="Simulator thread crashed"):
            deadline = time.time() + 10
            while time.time() < deadline:
                ds.get_trajectories(1, 4)
                time.sleep(0.1)
    finally:
        ds.close()


def test_collect_training_flag_selects_split():
    """VERDICT r1 #3: use_training_set must reach the buffer split.
    Train episodes are all-1.0 frames, test episodes all-2.0; collect must
    return the matching constant."""
    ds = HostReplayDatasource(
        FakeEnv, num_actions=3, num_rewards=2, channels=2,
        min_buffer_len=1, max_trajectory_len=8, seed=0)
    ds._ensure_started = lambda: None  # no actor: buffers are hand-filled

    def episode(value):
        n = 8
        return (np.full((n, 2, 4, 4), value, np.float32),
                np.zeros((n, 2), np.float32),
                np.zeros((n,), np.int64))

    for _ in range(3):
        ds.buffer._train.append(episode(1.0))
        ds.buffer._test.append(episode(2.0))

    obs_tr, _, _, _ = ds.collect(2, 5, training=True)
    obs_te, _, _, _ = ds.collect(2, 5, training=False)
    assert float(np.asarray(obs_tr).min()) == 1.0
    assert float(np.asarray(obs_tr).max()) == 1.0
    assert float(np.asarray(obs_te).min()) == 2.0
    assert float(np.asarray(obs_te).max()) == 2.0


def test_measure_prediction_mse_forwards_split(tmp_path):
    """analysis/mse.py must forward use_training_set -> collect(training=...)
    (dead parameter in round 1)."""
    from scmgan_tpu.analysis.mse import measure_prediction_mse
    from scmgan_tpu.data import allocate_datasource

    ds = allocate_datasource("gridworld", seed=0)
    seen = {}
    orig = ds.collect

    def spy(batch_size, timesteps, policy="random", key=None, training=True):
        seen["training"] = training
        return orig(batch_size, timesteps, policy, key=key, training=training)

    ds.collect = spy
    from scmgan_tpu.train.trainer import init_train_state
    from scmgan_tpu.config import Config

    state = init_train_state(Config(env="gridworld"), ds.spec,
                             jax.random.PRNGKey(0))
    measure_prediction_mse(state.params, ds, timesteps=8, batch_size=2,
                           use_training_set=True, out_dir=str(tmp_path),
                           make_plots=False, key=jax.random.PRNGKey(1))
    assert seen["training"] is True
    measure_prediction_mse(state.params, ds, timesteps=8, batch_size=2,
                           use_training_set=False, out_dir=str(tmp_path),
                           make_plots=False, key=jax.random.PRNGKey(1))
    assert seen["training"] is False


def test_native_stitch_arena_incremental():
    """The stitch arena is slotted and incremental: unchanged calls do no
    copy work, and a new episode only touches its own slot — a whole-
    buffer concat per collect() (hundreds of MB on live envs) dominated
    the train loop (found live on gymnasium CarRacing)."""
    ds = HostReplayDatasource(
        FakeEnv, num_actions=3, num_rewards=2, channels=2, seed=0)
    ds.buffer.test_holdout = -1.0  # deterministic: every episode -> train
    ep = (np.zeros((8, 2, 4, 4), np.float32),
          np.zeros((8, 2), np.float32), np.zeros((8,), np.int64))
    for _ in range(5):
        ds.buffer.add(ep)
    out = ds._try_native_stitch(2, 6, True, True)
    if out is None:
        pytest.skip("native stitcher unavailable")
    arena = ds._arena_cache[True]
    frames0 = arena.frames
    ds._try_native_stitch(2, 6, True, True)
    assert ds._arena_cache[True] is arena  # cache hit: same arena object
    assert arena.frames is frames0

    ep2 = (np.full((6, 2, 4, 4), 0.5, np.float32),
           np.ones((6, 2), np.float32), np.ones((6,), np.int64))
    ds.buffer.add(ep2)  # appends slot 5; slots 0-4 untouched
    ds._try_native_stitch(2, 6, True, True)
    arena2 = ds._arena_cache[True]
    assert arena2 is arena  # updated in place, not rebuilt
    assert arena2.slot_versions == ds.buffer._train_slot_versions
    for i, e in enumerate(ds.buffer._train):
        row = i * arena2.stride
        assert arena2.lengths[i] == len(e[0])
        np.testing.assert_array_equal(
            arena2.frames[row], np.asarray(e[0][0], np.float32))

    # reservoir replacement: overwrite a slot, only that slot re-ingests
    ds.buffer.capacity = len(ds.buffer._train)
    ep3 = (np.full((7, 2, 4, 4), 0.25, np.float32),
           np.zeros((7, 2), np.float32), np.zeros((7,), np.int64))
    ds.buffer.add(ep3)
    ds._try_native_stitch(2, 6, True, True)
    arena3 = ds._arena_cache[True]
    assert arena3 is arena
    assert arena3.slot_versions == ds.buffer._train_slot_versions
    replaced = [i for i, e in enumerate(ds.buffer._train) if len(e[0]) == 7]
    assert len(replaced) == 1
    row = replaced[0] * arena3.stride
    np.testing.assert_array_equal(
        arena3.frames[row:row + 7],
        np.full((7, 2, 4, 4), 0.25, np.float32))


def test_collect_key_drives_clip_sampling():
    """collect(key=...) must decorrelate the clip-sampling stream: the
    multi-host trainer folds its per-process batch offset into the key, so
    two processes with identical buffers draw distinct clips (and the same
    key reproduces the same batch)."""
    def build():
        ds = HostReplayDatasource(
            FakeEnv, num_actions=3, num_rewards=2, channels=2, seed=0)
        ds.buffer.test_holdout = -1.0
        # Freeze the buffer: the determinism contract is conditioned on
        # identical buffer contents, so the live actor thread (which would
        # race episodes into the reservoir under a loaded machine) must
        # not start for this test.
        ds._ensure_started = lambda: None
        for i in range(6):
            frames = np.arange(10, dtype=np.float32).reshape(10, 1, 1, 1)
            frames = np.broadcast_to(frames + 100 * i, (10, 2, 4, 4)).copy()
            ds.buffer.add((frames, np.zeros((10, 2), np.float32),
                           np.zeros((10,), np.int64)))
        return ds

    k0, k1 = jax.random.PRNGKey(7), jax.random.PRNGKey(8)
    b_a = np.asarray(build().collect(4, 5, key=k0)[0])
    b_same = np.asarray(build().collect(4, 5, key=k0)[0])
    b_diff = np.asarray(build().collect(4, 5, key=k1)[0])
    np.testing.assert_array_equal(b_a, b_same)
    assert not np.array_equal(b_a, b_diff)


def test_warmup_resets_on_early_termination():
    """Warm-up no-ops must not step (and then record) a terminated env
    across a reset boundary; the episode restarts instead."""
    buf = ReplayBuffer(capacity=4, test_holdout=-1.0, seed=0)
    actor = HostActor(lambda: FakeEnv(episode_len=2), buf, num_rewards=1,
                      warmup_steps=3, max_trajectory_len=5)
    actor.play_episodes(1)
    frames, _, _ = buf._train[0]
    # FakeEnv frames carry their step index: warm-up hits done at t=2,
    # resets, takes one more warm-up step -> recording starts at t=1
    assert frames[0].max() == 1.0


def test_actor_stop_joins_and_closes():
    """close()/stop() must join the daemon thread and close the emulator —
    no in-flight episode left stepping a torn-down backend."""
    ds = HostReplayDatasource(
        lambda: FakeEnv(episode_len=1000), num_actions=3, num_rewards=1,
        channels=2, min_buffer_len=1, max_trajectory_len=1000, seed=0)
    ds.buffer.test_holdout = -1.0
    ds._ensure_started()
    time.sleep(0.2)  # let it get mid-episode
    env = ds.actor._env
    ds.close()
    assert not ds.actor.is_alive()
    assert env is not None and env.closed
    ds.close()  # idempotent


def test_n_actors_fill_one_buffer_and_scale_ingest():
    """VERDICT r2 #4: N daemon actors, one buffer.  With a slow env
    (sleep inside step), 4 actors must ingest episodes materially faster
    than 1 — the reference keeps slow host envs from starving the trainer
    the same way, via a 4-worker pool (reference multi_env.py:8-39)."""

    class SlowEnv(FakeEnv):
        def step(self, action):
            time.sleep(0.01)  # releases the GIL, like a real emulator
            return super().step(action)

    def ingest_rate(n_actors):
        ds = HostReplayDatasource(
            SlowEnv, num_actions=3, num_rewards=1, channels=2,
            min_buffer_len=1, max_trajectory_len=6, seed=0,
            n_actors=n_actors)
        ds.buffer.test_holdout = -1.0  # all episodes -> train split
        try:
            ds._ensure_started()
            time.sleep(1.0)
            return ds.buffer.version  # == episodes ingested
        finally:
            ds.close()

    r1, r4 = ingest_rate(1), ingest_rate(4)
    assert r4 >= 2 * r1, (r1, r4)
    # all actors stopped
    ds = HostReplayDatasource(
        SlowEnv, num_actions=3, num_rewards=1, channels=2,
        min_buffer_len=1, n_actors=3, seed=0)
    ds._ensure_started()
    ds.close()
    assert not any(a.is_alive() for a in ds.actors)


def test_n_actors_any_death_detected():
    class CrashingEnv(FakeEnv):
        def reset(self):
            raise RuntimeError("emulator exploded")

    # one good actor cannot mask a crashed sibling
    calls = [0]

    def make_env():
        calls[0] += 1
        return FakeEnv() if calls[0] % 2 else CrashingEnv()

    ds = HostReplayDatasource(
        make_env, num_actions=3, num_rewards=1, channels=2,
        min_buffer_len=1, n_actors=2, seed=0)
    try:
        with pytest.raises(RuntimeError, match="Simulator thread crashed"):
            deadline = time.time() + 10
            while time.time() < deadline:
                ds.get_trajectories(1, 4)
                time.sleep(0.1)
    finally:
        ds.close()


def test_multi_host_environment_contract():
    """Thread-pooled synchronous batch stepping (reference
    multi_env.py:14-38): stacked outputs, auto-reset of finished envs."""
    from scmgan_tpu.envs.host.multi_env import MultiHostEnvironment

    envs = [FakeEnv(episode_len=2 + i) for i in range(4)]
    menv = MultiHostEnvironment(envs)
    try:
        states0 = menv.reset()
        assert len(states0) == 4
        assert menv.action_space.n == 3

        # step until the shortest env finishes: done must be reported AND
        # the env must already be reset for the next step
        s, r, d, infos = menv.step([1, 1, 1, 1])
        assert s.shape == (4, 2, 4, 4)
        assert r.shape == (4,) and d.shape == (4,)
        assert len(infos) == 4
        s, r, d, _ = menv.step([2, 2, 2, 2])
        assert bool(d[0]) and not bool(d[3])
        assert envs[0].t == 0  # auto-reset happened
        s, r, d, _ = menv.step([0, 0, 0, 0])
        assert not bool(d[0])  # fresh episode running

        with pytest.raises(ValueError):
            menv.step([0, 0])
    finally:
        menv.close()
    assert all(e.closed for e in envs)
