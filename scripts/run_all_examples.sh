#!/bin/bash
# Smoke-run every example driver on small synthetic workloads.
# CPU by default (fast, virtual 8-device mesh); FORCE_CPU=0 uses the
# default backend.
set -e
cd "$(dirname "$0")/../examples"
export PYTHONPATH="$(dirname "$PWD")"
if [ "${FORCE_CPU:-1}" = "1" ]; then
  export JAX_PLATFORMS=cpu
  export XLA_FLAGS="--xla_force_host_platform_device_count=8 ${XLA_FLAGS}"
  FIX='import jax; jax.config.update("jax_platforms", "cpu")'
else
  FIX=''
fi
OUT="${OUT:-/tmp/ocm_examples}"
run() {
  name=$1; shift
  echo "=== $name $* ==="
  python -c "$FIX
import sys; sys.argv = ['$name'] + '''$*'''.split(); exec(open('$name.py').read())"
}
run simca_cheese --out-dir $OUT/sc
run cv_simca --lv-max 6 --out-dir $OUT/cv
run simca_nuts --out-dir $OUT/sn
run nut_data_prep --out-path $OUT/nuts.h5
run vae_simca_cheese --epochs 8 --latent-dim 6 --conv-blocks 2 --n-filters 8 --hidden-fc 32 --out-dir $OUT/vsc
run vae_nuts --epochs 6 --latent-dim 6 --out-dir $OUT/vn
run hpo_nuts --n-trials 2 --epochs 4 --out-dir $OUT/hpo
run hpo_nuts --tpe --n-trials 2 --epochs 4 --out-dir $OUT/hpo_tpe
run hpo_nuts --bohb --brackets 1 --n-trials 2 --epochs 4 --out-dir $OUT/hpo_bohb
run full_pipeline --quick --lv-max 4 --out-dir $OUT/pipeline
run cheese_eda_plsda --max-components 8 --out-dir $OUT/plsda
run sweep_vae --mode vmapped --epochs 5
run sweep_vae --mode sharded --epochs 4
run sweep_vae --mode runner --epochs 3 --out-dir $OUT/sw
run distributed_scoring --n-spectra 20000
run multiclass_vae_screen --epochs 4 --variant vaesimca
run hsi_pipeline --size 96 --n-cubes 2
run streaming_refresh --length 120 --batches 5 --batch-n 128
echo "ALL EXAMPLES OK"
