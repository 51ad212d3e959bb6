from eld_tpu.parallel.mesh import MeshSpec, make_mesh, batch_sharding, replicated  # noqa: F401
