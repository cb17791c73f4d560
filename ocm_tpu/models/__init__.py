from ocm_tpu.models import (bundle, cv, plsda, simca, trainer, vae,
                            vae_decision, vaesimca)

__all__ = ["bundle", "cv", "plsda", "simca", "trainer", "vae",
           "vae_decision", "vaesimca"]
