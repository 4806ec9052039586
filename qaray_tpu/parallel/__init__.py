from qaray_tpu.parallel.mesh import make_render_mesh, shard_render_batch
