from xrseg_tpu.parallel import batch, mesh  # noqa: F401
from xrseg_tpu.parallel.mesh import make_mesh, shard_batch, shard_params  # noqa: F401
