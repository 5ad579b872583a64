"""On-device oracle episodes vs the host oracle loop.

The two loops draw env-step keys from different PRNG chains, so exact
trajectory equality is only guaranteed on deterministic-dynamics
environments — gridworld qualifies (its step ignores the key), making
the comparison exact: same seeds, same beam, same argmax path.
"""

import numpy as np

from scmgan_tpu.agent.oracle import play_oracle, play_oracle_on_device
from scmgan_tpu.envs import get_env

MAX_STEPS, LOOKAHEAD, DEPTH = 12, 1, 3


def test_device_oracle_matches_host_loop():
    spec = get_env("gridworld")
    host = [play_oracle(spec, max_steps=MAX_STEPS, lookahead=LOOKAHEAD,
                        rollout_depth=DEPTH, seed=s)[0] for s in (0, 1)]
    dev, steps = play_oracle_on_device(
        spec, episodes=2, max_steps=MAX_STEPS, lookahead=LOOKAHEAD,
        rollout_depth=DEPTH, seed0=0, verbose=False)
    np.testing.assert_allclose(dev, host, atol=1e-6)
    assert all(t == MAX_STEPS + 1 for t in steps)  # gridworld never ends
