from volpick_tpu.parallel.mesh import make_mesh, batch_sharding, replicated, initialize_distributed

__all__ = ["make_mesh", "batch_sharding", "replicated", "initialize_distributed"]
