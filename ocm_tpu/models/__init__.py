from ocm_tpu.models import (bundle, cv, plsda, simca, torch_import, trainer,
                            vae, vae_decision, vaesimca)

__all__ = ["bundle", "cv", "plsda", "simca", "torch_import", "trainer",
           "vae", "vae_decision", "vaesimca"]
