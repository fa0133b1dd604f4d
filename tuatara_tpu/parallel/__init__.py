from tuatara_tpu.parallel.mesh import make_mesh
from tuatara_tpu.parallel.sharding import shard_pages, sharded_ocr_programs

__all__ = ["make_mesh", "shard_pages", "sharded_ocr_programs"]
