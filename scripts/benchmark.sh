#!/usr/bin/env bash
# End-to-end CLI benchmark over the ViT family and quant types.
#
# Rebuild of the reference's scripts/benchmark.sh (SURVEY.md C16): for each
# model size, write a model file, optionally quantize it to all five block
# formats, run the `vit` CLI N times on a sample image under /usr/bin/time,
# and print a markdown table of average wall time + peak RSS. The reference
# converts pretrained timm checkpoints; offline, models come from the
# synthetic generator (identical shapes/dtypes), which benchmarks the same
# compute.
#
# Usage: scripts/benchmark.sh [-n runs] [-s "tiny small"] [-q] [-i image] [-g img_size]
set -euo pipefail

RUNS=3
SIZES="tiny small"
QUANTIZE=0
IMG_SIZE=224
IMAGE="$(cd "$(dirname "$0")/.." && pwd)/assets/magpie.jpeg"
WORK=$(mktemp -d)
trap 'rm -rf "$WORK"' EXIT

while getopts "n:s:qi:g:" opt; do
  case $opt in
    n) RUNS=$OPTARG ;;
    s) SIZES=$OPTARG ;;
    q) QUANTIZE=1 ;;
    i) IMAGE=$OPTARG ;;
    g) IMG_SIZE=$OPTARG ;;
    *) echo "usage: $0 [-n runs] [-s sizes] [-q] [-i image] [-g img_size]" >&2; exit 1 ;;
  esac
done

hidden()  { case $1 in tiny) echo 192;; small) echo 384;; base) echo 768;; large) echo 1024;; esac; }
layers()  { case $1 in tiny|small|base) echo 12;; large) echo 24;; esac; }
heads()   { case $1 in tiny) echo 3;; small) echo 6;; base) echo 12;; large) echo 16;; esac; }

gen_model() { # size -> path
  local size=$1 out=$2
  python - "$size" "$out" "$IMG_SIZE" <<'EOF'
import sys
from vit_cpp_tpu.hparams import VitHParams
from vit_cpp_tpu.testing.synthetic import write_synthetic_model
geo = {"tiny": (192,12,3), "small": (384,12,6), "base": (768,12,12), "large": (1024,24,16)}
h, L, nh = geo[sys.argv[1]]
hp = VitHParams(hidden_size=h, num_hidden_layers=L, num_attention_heads=nh,
                num_classes=1000, patch_size=16, img_size=int(sys.argv[3]))
write_synthetic_model(sys.argv[2], hp, ftype=1, seed=0)
EOF
}

run_cli() { # model -> "avg_ms peak_rss_kb" (wall + child max RSS via
  # getrusage; the reference shells out to /usr/bin/time -f "%e %M",
  # which not every image ships)
  local model=$1 total=0 rss=0
  for _ in $(seq "$RUNS"); do
    local out
    out=$(python - "$model" "$IMAGE" <<'EOF'
import resource, subprocess, sys, time
t0 = time.perf_counter()
subprocess.run(
    [sys.executable, "-m", "vit_cpp_tpu.cli.vit", "-m", sys.argv[1],
     "-i", sys.argv[2], "-k", "1"],
    stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL, check=True)
secs = time.perf_counter() - t0
kb = resource.getrusage(resource.RUSAGE_CHILDREN).ru_maxrss
print(f"{secs:.3f} {kb}")
EOF
    )
    local secs=$(echo "$out" | awk '{print $1}')
    local kb=$(echo "$out" | awk '{print $2}')
    total=$(awk -v a="$total" -v b="$secs" 'BEGIN{printf "%.3f", a+b}')
    [ "$kb" -gt "$rss" ] && rss=$kb
  done
  local avg_ms=$(awk -v t="$total" -v n="$RUNS" 'BEGIN{printf "%.1f", t*1000/n}')
  echo "$avg_ms $rss"
}

echo "| model | file | avg wall ms (n=$RUNS) | peak RSS MB |"
echo "|---|---|---|---|"
for size in $SIZES; do
  f16="$WORK/vit_${size}_f16.gguf"
  gen_model "$size" "$f16"
  read -r ms rss < <(run_cli "$f16")
  echo "| vit_${size}_patch16_${IMG_SIZE} | f16 | $ms | $((rss / 1024)) |"
  if [ "$QUANTIZE" = 1 ]; then
    for it in 2 3 6 7 8; do
      qf="$WORK/vit_${size}_q${it}.gguf"
      python -m vit_cpp_tpu.cli.quantize "$f16" "$qf" "$it" >/dev/null
      read -r ms rss < <(run_cli "$qf")
      name=$(python -c "print({2:'q4_0',3:'q4_1',6:'q5_0',7:'q5_1',8:'q8_0'}[$it])")
      echo "| vit_${size}_patch16_${IMG_SIZE} | $name | $ms | $((rss / 1024)) |"
    done
  fi
done
