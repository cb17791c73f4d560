from ocm_tpu.models import (bundle, cv, simca, trainer, vae, vae_decision,
                            vaesimca)

__all__ = ["bundle", "cv", "simca", "trainer", "vae", "vae_decision",
           "vaesimca"]
