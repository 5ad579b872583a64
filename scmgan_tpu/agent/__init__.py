from scmgan_tpu.agent.mpc import make_planner, rollout_reward_table  # noqa: F401
from scmgan_tpu.agent.play import play  # noqa: F401
