from deciphon_tpu.parallel.mesh import make_scan_mesh
from deciphon_tpu.parallel.sharded_scan import sharded_scan_step

__all__ = ["make_scan_mesh", "sharded_scan_step"]
