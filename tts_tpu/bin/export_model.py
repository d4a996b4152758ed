"""Export a trained model to a portable compiled artifact
(the reference exposes ONNX export for VITS — ``vits.py:1806``; here the
jitted inference program is serialized as StableHLO, loadable by any JAX
runtime without the model code: see ``tts_tpu/utils/export.py``).

Example:
  python -m tts_tpu.bin.export_model --config_path config.json \
      --checkpoint run/best_model.msgpack --output model.tpuexport \
      --max_text_len 200 --max_frames 1000
"""

from __future__ import annotations

import argparse


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config_path", required=True)
    parser.add_argument("--checkpoint", required=True)
    parser.add_argument("--output", default="model.tpuexport")
    parser.add_argument("--max_text_len", type=int, default=200)
    parser.add_argument("--max_frames", type=int, default=1000)
    parser.add_argument("--platforms", default="cpu,tpu")
    args = parser.parse_args()

    from tts_tpu.config import load_config
    from tts_tpu.models import setup_model
    from tts_tpu.utils.export import export_vits_inference
    from tts_tpu.utils.io import load_checkpoint

    config = load_config(args.config_path)
    if config.model != "vits":
        raise SystemExit(f"export currently supports VITS (got {config.model!r})")
    params, _, _ = load_checkpoint(args.checkpoint)
    if isinstance(params, dict) and set(params) <= {"model", "gen", "disc"}:
        params = params.get("gen") or params.get("model")
    model = setup_model(config)
    path = export_vits_inference(
        model, params, args.output,
        max_frames=args.max_frames, max_text_len=args.max_text_len,
    )
    print(f" > Exported {config.model} to {path}")


if __name__ == "__main__":
    main()
