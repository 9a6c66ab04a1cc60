#!/usr/bin/env bash
# One-command runner for the two environment-blocked fidelity claims
# (VERDICT r2 "What's missing" #2/#3). Run this the moment the environment
# has egress (or the artifacts are staged out-of-band):
#
#   ./scripts/run_fidelity.sh [DATASETS_DIR]
#
# 1. stages the real JetNet gluon data (Zenodo record 3601443,
#    checksum-verified) into DATASETS_DIR (default: <repo>/datasets),
# 2. runs tests/test_real_data.py — loader sanity on the real file,
#    real-vs-real W1-M null check, and the BASELINE.md claim: shipped
#    trained_models/mp_g weights reach W1-M parity within the reference
#    error bars (arXiv:2106.11535 Table 1),
# 3. if DATASETS_DIR/pnet_state_dict.pt exists (copy it from an installed
#    jetnet: jetnet/evaluation/fpnd_resources/.../pnet_state_dict.pt), runs
#    an FPND import smoke: the weaver-schema importer must load it without
#    key mismatch and produce finite FPND on synthetic jets.
#
# No new code paths: everything here calls surfaces that are already tested
# on format-identical stand-ins (test_real_data.py::test_hdf5_loading_path,
# tests/test_fpnd_import.py).
set -euo pipefail
cd "$(dirname "$0")/.."

DATASETS="${1:-$(pwd)/datasets}"
export MPGAN_TPU_DATASETS="$DATASETS"
mkdir -p "$DATASETS"

echo "== 1/3 staging JetNet (g) into $DATASETS =="
if [ -f "$DATASETS/g.hdf5" ]; then
    python scripts/stage_jetnet.py --datasets-path "$DATASETS" --verify-only
else
    python scripts/stage_jetnet.py --datasets-path "$DATASETS" --jets g
fi

echo "== 2/3 real-data fidelity tests =="
python -m pytest tests/test_real_data.py -v

echo "== 3/3 FPND importer first-contact smoke =="
if [ -f "$DATASETS/pnet_state_dict.pt" ]; then
    python - <<'EOF'
import os
import numpy as np

from mpgan_tpu.data.jetnet import synthetic_jets
from mpgan_tpu.evaluation.fpnd import make_fpnd_fn

path = os.path.join(os.environ["MPGAN_TPU_DATASETS"], "pnet_state_dict.pt")
fn = make_fpnd_fn(path)  # raises loudly on any key-schema mismatch
real, _ = synthetic_jets("g", 2000, 30)
gen, _ = synthetic_jets("g", 2000, 30, seed=1)
val = float(fn(gen[..., :3], "g", real[..., :3]))
assert np.isfinite(val), f"FPND not finite: {val}"
print(f"FPND import smoke OK: pnet_state_dict.pt loaded, FPND={val:.4f}")
EOF
else
    echo "SKIP: $DATASETS/pnet_state_dict.pt not present."
    echo "  Copy it from a jetnet install:"
    echo "  python -c 'import jetnet, pathlib; p = pathlib.Path(jetnet.__file__).parent; print(next(p.rglob(\"pnet_state_dict.pt\")))'"
fi

echo "== 4/4 FPD protocol cross-check vs jetnet.evaluation.fpd =="
if python -c "import jetnet" 2>/dev/null; then
    python - <<'EOF'
# Numerical diff of this repo's fpd() against the published implementation
# (jetnet.evaluation.fpd, arXiv:2211.10295; reference train.py:750-755).
# Basis: jetnet feeds the energyflow ("d<=", 4) EFPSet (36 cols incl. the
# degree-0 constant); we compute the same 35 non-constant columns natively
# (order differs — Frechet distance is permutation-invariant; the constant
# contributes exactly 0, tests/test_data_eval.py pins both facts).
import numpy as np
import jetnet

from mpgan_tpu.data.jetnet import synthetic_jets
from mpgan_tpu.evaluation import fpd

real, _ = synthetic_jets("g", 20000, 30, seed=1)
gen, _ = synthetic_jets("g", 20000, 30, seed=2)
gen[..., 0] *= 1.2  # make the distance nonzero

ours, ours_std = fpd(real[..., :3], gen[..., :3],
                     min_samples=5000, max_samples=20000)
re_efps = jetnet.utils.efps(real[..., :3], efpset_args=[("d<=", 4)])
ge_efps = jetnet.utils.efps(gen[..., :3], efpset_args=[("d<=", 4)])
theirs, theirs_std = jetnet.evaluation.fpd(
    np.nan_to_num(re_efps), np.nan_to_num(ge_efps),
    min_samples=5000, max_samples=20000)
rel = abs(ours - theirs) / max(abs(theirs), 1e-12)
print(f"ours   = {ours:.6g} +- {ours_std:.2g}")
print(f"jetnet = {theirs:.6g} +- {theirs_std:.2g}")
print(f"relative difference = {rel:.4f}")
# identical protocol, independent EFP engines + subsampling rngs: agreement
# expected within the estimators' own error bars (a few sigma)
tol = 5 * max(ours_std, theirs_std) / max(abs(theirs), 1e-12) + 0.02
assert rel < tol, f"FPD mismatch: rel {rel} > tol {tol}"
print("FPD cross-check OK")
EOF
else
    echo "SKIP: jetnet not importable in this environment."
    echo "  pip install jetnet, then re-run this script."
fi
echo "== fidelity runner complete =="
