from bacs_tpu.parallel.mesh import make_data_mesh, multihost_init  # noqa: F401
