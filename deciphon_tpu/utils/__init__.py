from deciphon_tpu.utils.rc import RC, DcpError
from deciphon_tpu.utils.xmath import lrt, partition_size, partition_starts

__all__ = ["RC", "DcpError", "lrt", "partition_size", "partition_starts"]
