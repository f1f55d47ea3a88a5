from .mesh import make_mesh, make_sp_mesh, multihost_init  # noqa: F401
from .partition import lm_param_specs, opt_state_specs, zero1_specs  # noqa: F401
