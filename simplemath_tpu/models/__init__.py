"""Model / solver layer: benchmark dynamical systems and the batched
iLQR/DDP + SQP-MPC trajectory optimizers (BASELINE.json north star)."""

from .dynamics import (  # noqa: F401
    SYSTEMS,
    System,
    make_bicycle,
    make_cartpole,
    make_pendulum,
    make_quadrotor,
    rk4,
)
from .ilqr import (  # noqa: F401
    ILQRConfig,
    ILQRResult,
    rollout,
    solve,
    solve_batched,
    trajectory_cost,
)
from .rti import (  # noqa: F401
    RTIConfig,
    RTIState,
    rti_closed_loop,
    rti_init,
    rti_tick,
)
from .sqp_mpc import (  # noqa: F401
    MPCController,
    SQPConfig,
    make_scenario_mpc_step,
    scenario_mpc_solve,
    scenario_mpc_step,
    solve_constrained,
)
from .simulate import SimResult, closed_loop  # noqa: F401
