"""MiniPacman — a fully on-device JAX reimplementation.

The reference wraps the external ``gym_minipacman`` package (reference
envs/minipacman.py:28-45) with reward config step=0, food=+1, big_pill=+2,
ghost_hunt=+5, ghost_death=-1, episode ends when all food is eaten
(all_food_terminate) — and 5 actions {NOOP, RIGHT, UP, LEFT, DOWN}, with
rewards split into (positive, negative) channels
(envs/minipacman.py:29-43,105-106).  That package is an external host-side
dependency; here the whole game — maze, food, power pills, three chasing
ghosts, power timer — is a pure ``step(state, action, key)`` function, so
trajectory collection compiles onto the TPU like every other synthetic env
(the reference instead runs a daemon actor thread filling a replay buffer,
envs/minipacman.py:50-120).

Board: a 16x16 maze rendered at 64x64 (4x4 px per cell, NHWC):
walls dim blue, food small green dots, power pills large white dots,
pacman yellow, ghosts red (blue-white while edible).

Contract parity (what the learner sees): 5 actions, 2 reward channels
(positive, negative), rewards {+1 food, +2 pill, +5 ghost eaten,
-1 death}, done on all-food-eaten or death.  The pixel art differs from
gym_minipacman's (which is not pixel-replicable without the dependency).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from scmgan_tpu.envs.base import EnvSpec, register

NUM_ACTIONS = 5   # NOOP, RIGHT, UP, LEFT, DOWN (envs/minipacman.py:30)
NUM_REWARDS = 2
N = 16            # maze cells
SCALE = 4         # render upscale -> 64x64
G = N * SCALE
N_GHOSTS = 3
POWER_STEPS = 20

# Maze: '#' wall, '.' food, 'o' power pill, ' ' empty corridor.
_MAZE_STR = [
    "################",
    "#o.....##.....o#",
    "#.####.##.####.#",
    "#.#..........#.#",
    "#.#.###..###.#.#",
    "#...#......#...#",
    "#.#.#.#  #.#.#.#",
    "#.#...#..#...#.#",
    "#.#...#..#...#.#",
    "#.#.#.####.#.#.#",
    "#...#......#...#",
    "#.#.###..###.#.#",
    "#.#..........#.#",
    "#.####.##.####.#",
    "#o.....##.....o#",
    "################",
]

WALLS = jnp.asarray(
    np.array([[c == "#" for c in row] for row in _MAZE_STR]), bool)
FOOD0 = jnp.asarray(
    np.array([[c == "." for c in row] for row in _MAZE_STR]), bool)
PILLS0 = jnp.asarray(
    np.array([[c == "o" for c in row] for row in _MAZE_STR]), bool)

# action -> (drow, dcol): NOOP, RIGHT, UP, LEFT, DOWN
_DR = jnp.array([0, 0, -1, 0, 1], jnp.int32)
_DC = jnp.array([0, 1, 0, -1, 0], jnp.int32)

# Pacman spawns in the lower corridor, ghosts in the central chamber —
# several corridors apart, so random-policy episodes last tens of steps
# (spawning them adjacent makes every rollout die within ~2 steps, which
# starves training and the free-run eval of usable trajectory length).
_PACMAN_START = (12, 7)
_GHOST_STARTS = ((7, 7), (7, 8), (8, 8))
_CHASE_EXPLORE = 0.35  # ghosts pick a random legal move this often


class State(NamedTuple):
    pac_r: jax.Array
    pac_c: jax.Array
    ghost_r: jax.Array      # (N_GHOSTS,)
    ghost_c: jax.Array      # (N_GHOSTS,)
    food: jax.Array         # (N, N) bool
    pills: jax.Array        # (N, N) bool
    power: jax.Array        # int32 steps of ghost edibility remaining
    alive: jax.Array        # bool


def reset(key: jax.Array) -> State:
    return State(
        pac_r=jnp.int32(_PACMAN_START[0]),
        pac_c=jnp.int32(_PACMAN_START[1]),
        ghost_r=jnp.array([g[0] for g in _GHOST_STARTS], jnp.int32),
        ghost_c=jnp.array([g[1] for g in _GHOST_STARTS], jnp.int32),
        food=FOOD0,
        pills=PILLS0,
        power=jnp.int32(0),
        alive=jnp.bool_(True),
    )


def _try_move(r, c, action):
    nr = jnp.clip(r + _DR[action], 0, N - 1)
    nc = jnp.clip(c + _DC[action], 0, N - 1)
    blocked = WALLS[nr, nc]
    return jnp.where(blocked, r, nr), jnp.where(blocked, c, nc)


def _ghost_move(r, c, pac_r, pac_c, powered, key):
    """Chase pacman greedily (flee while powered), 25% random exploration."""
    cand_r = jnp.clip(r + _DR, 0, N - 1)
    cand_c = jnp.clip(c + _DC, 0, N - 1)
    legal = ~WALLS[cand_r, cand_c]
    legal = legal.at[0].set(False)  # ghosts never stand still
    dist = jnp.abs(cand_r - pac_r) + jnp.abs(cand_c - pac_c)
    objective = jnp.where(powered, -dist, dist).astype(jnp.float32)
    k1, k2 = jax.random.split(key)
    noise = jax.random.uniform(k1, (NUM_ACTIONS,), maxval=0.1)
    scores = jnp.where(legal, -objective - noise, -jnp.inf)
    greedy = jnp.argmax(scores)
    rand_scores = jnp.where(legal, jax.random.uniform(k2, (NUM_ACTIONS,)),
                            -jnp.inf)
    random_a = jnp.argmax(rand_scores)
    a = jnp.where(
        jax.random.uniform(jax.random.fold_in(k2, 1)) < _CHASE_EXPLORE,
        random_a, greedy)
    return cand_r[a], cand_c[a]


def step(state: State, action: jax.Array, key: jax.Array):
    pac_r, pac_c = _try_move(state.pac_r, state.pac_c, action)

    # eat food / pill
    got_food = state.food[pac_r, pac_c]
    got_pill = state.pills[pac_r, pac_c]
    food = state.food.at[pac_r, pac_c].set(False)
    pills = state.pills.at[pac_r, pac_c].set(False)
    power = jnp.where(got_pill, POWER_STEPS,
                      jnp.maximum(state.power - 1, 0)).astype(jnp.int32)
    powered = power > 0

    # ghosts move
    gkeys = jax.random.split(key, N_GHOSTS)
    gr, gc = jax.vmap(_ghost_move, in_axes=(0, 0, None, None, None, 0))(
        state.ghost_r, state.ghost_c, pac_r, pac_c, powered, gkeys)

    # collisions (either side moving onto the other)
    collide = ((gr == pac_r) & (gc == pac_c)) | (
        (state.ghost_r == pac_r) & (state.ghost_c == pac_c))
    eaten_ghosts = collide & powered
    caught = jnp.any(collide & ~powered)

    # eaten ghosts respawn at their start cells
    start_r = jnp.array([g[0] for g in _GHOST_STARTS], jnp.int32)
    start_c = jnp.array([g[1] for g in _GHOST_STARTS], jnp.int32)
    gr = jnp.where(eaten_ghosts, start_r, gr)
    gc = jnp.where(eaten_ghosts, start_c, gc)

    # rewards (reference reward config, envs/minipacman.py:31-43)
    pos = (got_food.astype(jnp.float32) * 1.0
           + got_pill.astype(jnp.float32) * 2.0
           + jnp.sum(eaten_ghosts).astype(jnp.float32) * 5.0)
    neg = jnp.where(caught, -1.0, 0.0)
    reward = jnp.stack([pos, neg])  # (positive, negative) channels

    all_food_eaten = ~jnp.any(food | pills)
    done = caught | all_food_eaten

    new_state = State(pac_r, pac_c, gr, gc, food, pills, power,
                      state.alive & ~caught)
    return new_state, reward, done


def _upscale(cells):
    """(N, N) -> (G, G) by SCALE x SCALE replication."""
    return jnp.repeat(jnp.repeat(cells, SCALE, axis=0), SCALE, axis=1)


_CENTER2 = jnp.zeros((SCALE, SCALE), jnp.float32).at[1:3, 1:3].set(1.0)
_CENTER3 = jnp.zeros((SCALE, SCALE), jnp.float32).at[1:4, 0:3].set(1.0)


def _dotscale(cells, dot):
    """(N, N) -> (G, G) placing ``dot`` (SCALE x SCALE) in occupied cells."""
    return jnp.kron(cells.astype(jnp.float32), dot)


def render(state: State) -> jax.Array:
    frame = jnp.zeros((G, G, 3), jnp.float32)
    walls = _upscale(WALLS).astype(jnp.float32)
    frame = frame.at[:, :, 2].max(walls * 0.5)

    food = _dotscale(state.food, _CENTER2)
    frame = frame.at[:, :, 1].max(food)

    pills = _dotscale(state.pills, _CENTER3)
    for ch in range(3):
        frame = frame.at[:, :, ch].max(pills)

    pac = jnp.zeros((N, N), bool).at[state.pac_r, state.pac_c].set(True)
    pac_px = _upscale(pac).astype(jnp.float32)
    frame = frame.at[:, :, 0].max(pac_px)
    frame = frame.at[:, :, 1].max(pac_px)

    ghosts = jnp.zeros((N, N), bool).at[state.ghost_r, state.ghost_c].set(True)
    ghost_px = _upscale(ghosts).astype(jnp.float32)
    powered = (state.power > 0).astype(jnp.float32)
    frame = frame.at[:, :, 0].max(ghost_px * jnp.maximum(1.0 - powered, 0.3))
    frame = frame.at[:, :, 2].max(ghost_px * powered)
    return frame


# ---------------------------------------------------------------------------
# Higgins ground-truth factor simulator (extension beyond the reference —
# the reference defines simulators only for pong/boxes/dsprites-style envs,
# higgins.py:22-87; the protocol itself is identical).
#
# Factor model (5 factors):
#   0 pac_row, 1 pac_col     — pacman's maze cell
#   2 ghost_row, 3 ghost_col — ONE varied ghost; the other two stay pinned
#                              at their spawn cells.  Ghosts are visually
#                              interchangeable (identical sprites), so
#                              per-ghost factors would be unidentifiable
#                              from pixels and cap the metric at chance on
#                              those rows — one varied ghost keeps the
#                              ceiling at 1.0.
#   4 powered               — pill state (binary via 0.5 threshold): flips
#                              ghost color red -> blue, a CHANNEL-coded
#                              factor (the conv-sum protocol's home turf,
#                              vs the spatially-coded position factors).
#
# Row/col factors snap to legal (non-wall) cells: the row factor picks
# among rows containing corridor cells, the col factor among that row's
# corridor columns — deterministic, and each factor moves its own axis.
# ---------------------------------------------------------------------------

TRUE_LATENT_DIM = 5

_FREE = ~np.asarray(WALLS)
_FREE_ROWS = np.asarray([r for r in range(N) if _FREE[r].any()], np.int32)
_MAXC = int(max(_FREE[r].sum() for r in _FREE_ROWS))
_FREE_COLS = np.zeros((N, _MAXC), np.int32)
_NCOLS = np.zeros((N,), np.int32)
for _r in _FREE_ROWS:
    _cols = np.flatnonzero(_FREE[_r])
    _NCOLS[_r] = len(_cols)
    _FREE_COLS[_r, :len(_cols)] = _cols
    _FREE_COLS[_r, len(_cols):] = _cols[-1]
_FREE_ROWS_J = jnp.asarray(_FREE_ROWS)
_FREE_COLS_J = jnp.asarray(_FREE_COLS)
_NCOLS_J = jnp.asarray(_NCOLS)

_SIM_CORE = None


def _cell_from_factors(fr, fc):
    r = _FREE_ROWS_J[jnp.clip(jnp.int32(fr * len(_FREE_ROWS)), 0,
                              len(_FREE_ROWS) - 1)]
    n = _NCOLS_J[r]
    c = _FREE_COLS_J[r, jnp.clip(jnp.int32(fc * n), 0, n - 1)]
    return r, c


def simulator(factor_batch) -> np.ndarray:
    """Factors (B, 5) in [0,1] -> rendered 64x64 frames for Higgins.

    Jitted and cached at module level (pattern of betterpong.py:130) to
    stay under XLA:CPU's per-process program budget."""
    factors = jnp.asarray(np.asarray(factor_batch), jnp.float32)

    def one(z):
        pr, pc = _cell_from_factors(z[0], z[1])
        gr0, gc0 = _cell_from_factors(z[2], z[3])
        gr = jnp.array([gr0, _GHOST_STARTS[1][0], _GHOST_STARTS[2][0]],
                       jnp.int32)
        gc = jnp.array([gc0, _GHOST_STARTS[1][1], _GHOST_STARTS[2][1]],
                       jnp.int32)
        power = jnp.where(z[4] > 0.5, POWER_STEPS, 0).astype(jnp.int32)
        return render(State(pr, pc, gr, gc, FOOD0, PILLS0, power,
                            jnp.bool_(True)))

    global _SIM_CORE
    if _SIM_CORE is None:
        _SIM_CORE = jax.jit(jax.vmap(one))
    return np.asarray(_SIM_CORE(factors))


@register("minipacman")
def make_spec() -> EnvSpec:
    return EnvSpec(
        name="minipacman",
        num_actions=NUM_ACTIONS,
        num_rewards=NUM_REWARDS,
        channels=3,
        height=G,
        width=G,
        reset=reset,
        step=step,
        render=render,
        true_latent_dim=TRUE_LATENT_DIM,
        simulator=simulator,
    )
