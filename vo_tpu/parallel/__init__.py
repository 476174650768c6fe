from vo_tpu.parallel.mesh import make_mesh, shard_frames
