from arec.dist.mesh import make_mesh, multihost_init, host_info
from arec.dist.specs import param_pspecs, batch_pspec, TABLE_AXIS, DATA_AXIS
