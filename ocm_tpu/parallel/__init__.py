from ocm_tpu.parallel import mesh, simca_dist, sweep_dist, train_dist

__all__ = ["mesh", "simca_dist", "sweep_dist", "train_dist"]
