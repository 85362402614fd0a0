#!/usr/bin/env bash
# Interactive batch runner — counterpart of the reference's
# run_inverse_pipeline.sh:1-29. Presets: (img, save_name, model, use_mask,
# opt_env_from, opt_src, opt_order...).
set -euo pipefail

declare -a PRESETS=(
  "examples/indoor1.png indoor1 pos_mlp 0 2 a rm a"
  "examples/indoor2.png indoor2 pos_mlp 0 2 a rm a"
  "examples/99866.png 99866 none 0 2 a rm a"
)

echo "Select a preset:"
i=0
for p in "${PRESETS[@]}"; do
  echo "  [$i] $p"
  i=$((i + 1))
done
read -r -p "index: " IDX
read -r -a CFG <<<"${PRESETS[$IDX]}"

IMG="${CFG[0]}"; NAME="${CFG[1]}"; MODEL="${CFG[2]}"; MASK="${CFG[3]}"
ENVFROM="${CFG[4]}"; SRC="${CFG[5]}"; ORDER=("${CFG[@]:6}")

ARGS=(--img_inverse_path "$IMG" --save_name "$NAME" --opt_src "$SRC"
      --opt_order "${ORDER[@]}" --opt_env_from "$ENVFROM"
      --model_name "$MODEL")
if [[ "$MASK" == "1" ]]; then ARGS+=(--use_mask); fi

echo "python -m materialist_tpu.cli.inverse ${ARGS[*]}"
python -m materialist_tpu.cli.inverse "${ARGS[@]}"

echo "Re-render:"
python -m materialist_tpu.cli.render_final --save_name "$NAME" --mode real
