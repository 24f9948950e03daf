from deciphon_tpu.db.dispatch import db_typeid, open_db
from deciphon_tpu.db.format import TensorDB, write_db
from deciphon_tpu.db.partition import balanced_partitions, bucket_by_core_size

__all__ = [
    "TensorDB", "write_db", "db_typeid", "open_db",
    "balanced_partitions", "bucket_by_core_size",
]
