#!/bin/bash
# End-of-round hardware verification battery: drive every CLI mode and
# extension knob against the golden fixtures on the REAL chip, byte-compare
# regenerated plotfiles, and append one OK/FAIL line per mode.
#
#   bash scripts/verify_battery.sh [LOGFILE]
#
# Expected output: every line OK except "byte-compare global", which is
# EXPECTED-lossy on the fixtures (their constant boxes put 12.5% of
# coefficients in the nonzero low band, above the 2% keepfraction
# quantile); global mode's chip check is TPU-vs-CPU bit-identity instead
# (GLOBAL_ARCHIVES_TPU_EQ_CPU / GLOBAL_REGEN_TPU_EQ_CPU lines).

set -u
# wavelet_tpu is not installed in the venv — `python -m wavelet_tpu.cli`
# resolves via cwd, so anchor at the repo root no matter where the
# battery is invoked from (round-4 advisor finding).
cd "$(dirname "$0")/.."
PY=/opt/venv/bin/python
REF=/root/reference/tests
LOG=${1:-/tmp/verify_battery.log}
ROOT=$(mktemp -d)
trap 'rm -rf "$ROOT"' EXIT

CARGS="datadir=$REF minfile=plt00074 maxfile=plt00075 minlevel=0 maxlevel=1"
COMPS="components=temp pressure"

run_cli() { $PY -m wavelet_tpu.cli "$@" >> "$LOG.detail" 2>&1; }

bytecmp() {  # $1 = regen dir
  diff -r "$REF/plt00074" "$1/plt00074" > /dev/null 2>&1 \
    && diff -r "$REF/plt00075" "$1/plt00075" > /dev/null 2>&1
}

mode() {  # $1 = label, rest = extra compress args (CEXTRA) via env DEXTRA
  local label=$1; shift
  local d="$ROOT/$label"
  if run_cli $CARGS "$COMPS" keep=0.999 compresseddir="$d/comp/" "$@" -c \
     && run_cli compresseddir="$d/comp/" out="$d/out/" ${DEXTRA:-} -d \
     && bytecmp "$d/out"; then
    echo "OK  $label" | tee -a "$LOG"
  else
    echo "FAIL $label" | tee -a "$LOG"
  fi
}

: > "$LOG"; : > "$LOG.detail"
echo "# battery on commit $(git -C /root/repo rev-parse --short HEAD), $(date -u)" | tee -a "$LOG"

mode parity
mode scales2 scales=2
mode raw_bundle codec=raw archive=bundle
mode q16 payload=q16
mode xzdelta xzdelta=8
DEXTRA="prefetch=1" mode prefetch prefetch=1
DEXTRA="transfer=sparse" mode sparse transfer=sparse
DEXTRA="transfer=auto" mode auto transfer=auto

# global threshold: EXPECTED lossy on the fixtures; chip check is
# TPU-vs-CPU bit identity of archives AND regenerated plotfiles
G="$ROOT/global"
run_cli $CARGS "$COMPS" thresholdmode=global keepfraction=0.02 \
        compresseddir="$G/tpu/" -c
run_cli compresseddir="$G/tpu/" out="$G/tpu_out/" -d
WAVELET_TPU_PLATFORM=cpu run_cli $CARGS "$COMPS" thresholdmode=global \
        keepfraction=0.02 compresseddir="$G/cpu/" -c
WAVELET_TPU_PLATFORM=cpu run_cli compresseddir="$G/cpu/" out="$G/cpu_out/" -d
if diff -r "$G/tpu" "$G/cpu" > /dev/null 2>&1; then
  echo "GLOBAL_ARCHIVES_TPU_EQ_CPU" | tee -a "$LOG"
else
  echo "FAIL global archives tpu-vs-cpu" | tee -a "$LOG"
fi
if diff -r "$G/tpu_out" "$G/cpu_out" > /dev/null 2>&1; then
  echo "GLOBAL_REGEN_TPU_EQ_CPU" | tee -a "$LOG"
else
  echo "FAIL global regen tpu-vs-cpu" | tee -a "$LOG"
fi

# estimate: expect zero RMSE / zero loss on the constant-box fixtures
E="$ROOT/est"
if run_cli $CARGS "$COMPS" keep=0.999 compresseddir="$E/" -estimate \
   && grep -q "RMSE" "$LOG.detail"; then
  echo "OK  estimate" | tee -a "$LOG"
else
  echo "FAIL estimate" | tee -a "$LOG"
fi
if run_cli $CARGS "$COMPS" "keep=0.99 0.999" fastestimate=1 \
           compresseddir="$ROOT/sweep/" -estimate; then
  echo "OK  keep sweep" | tee -a "$LOG"
else
  echo "FAIL keep sweep" | tee -a "$LOG"
fi

# archive validation + summary on the parity archive
if run_cli compresseddir="$ROOT/parity/comp/" -check; then
  echo "OK  check" | tee -a "$LOG"
else
  echo "FAIL check" | tee -a "$LOG"
fi
if run_cli compresseddir="$ROOT/parity/comp/" -info; then
  echo "OK  info" | tee -a "$LOG"
else
  echo "FAIL info" | tee -a "$LOG"
fi

# resume: a rerun into the populated archive must skip all items
if run_cli $CARGS "$COMPS" keep=0.999 resume=1 \
           compresseddir="$ROOT/parity/comp/" -c \
   && grep -q "skipped" "$LOG.detail"; then
  echo "OK  resume" | tee -a "$LOG"
else
  echo "FAIL resume" | tee -a "$LOG"
fi

# partial retrieval: only plt00075, must match the full run's bytes
P="$ROOT/partial"
if run_cli compresseddir="$ROOT/parity/comp/" out="$P/" \
           minfile=plt00075 maxfile=plt00075 -d \
   && diff -r "$REF/plt00075" "$P/plt00075" > /dev/null 2>&1; then
  echo "OK  partial retrieval" | tee -a "$LOG"
else
  echo "FAIL partial retrieval" | tee -a "$LOG"
fi

# preview: low-band plotfiles at half resolution (structure check only)
if run_cli compresseddir="$ROOT/parity/comp/" out="$ROOT/prev/" \
           preview=1 -d && [ -f "$ROOT/prev/plt00074/Header" ]; then
  echo "OK  preview" | tee -a "$LOG"
else
  echo "FAIL preview" | tee -a "$LOG"
fi

# outprec=f32: half-width FABs, values must EQUAL the f64 fixtures
if run_cli compresseddir="$ROOT/parity/comp/" out="$ROOT/f32/" \
           outprec=f32 -d \
   && $PY - "$REF" "$ROOT/f32" <<'EOF' >> "$LOG.detail" 2>&1
import sys
import numpy as np
from wavelet_tpu.io import plotfile
ref_root, got_root = sys.argv[1], sys.argv[2]
for t in ("plt00074", "plt00075"):
    for lev in (0, 1):
        r = plotfile.read_level(f"{ref_root}/{t}", lev, [0, 1])
        g = plotfile.read_level(f"{got_root}/{t}", lev, [0, 1])
        for rb, gb in zip(r.boxes, g.boxes):
            assert np.array_equal(rb, gb), (t, lev)
print("OUTPREC_VALUES_EQUAL")
EOF
then
  echo "OK  outprec=f32" | tee -a "$LOG"
else
  echo "FAIL outprec=f32" | tee -a "$LOG"
fi

FAILS=$(grep -c '^FAIL' "$LOG")
echo "BATTERY_FAILS:$FAILS" | tee -a "$LOG"
