"""Convert original descript-DAC torch weights into our JAX params and save
(optionally push). Equivalent of
`/root/reference/helpers/push_to_hub_scripts/push_dac_to_hub.py:19-26`, with the
torch->JAX weight-norm folding done by `codec/convert.py`.
"""

import argparse
import os
import pickle
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("weights", type=str,
                        help="descript .pth/.safetensors weights OR DACModel dir")
    parser.add_argument("output_dir", type=str)
    parser.add_argument("--prefix", type=str, default="",
                        help="key prefix inside the state dict (e.g. 'model.')")
    parser.add_argument("--push-to", type=str, default=None)
    args = parser.parse_args()

    import numpy as np

    from parler_tts_tpu.codec.convert import convert_dac_params
    from parler_tts_tpu.config import DACConfig

    if args.weights.endswith(".safetensors"):
        from safetensors import safe_open

        tensors = {}
        with safe_open(args.weights, framework="numpy") as f:
            for key in f.keys():
                tensors[key] = f.get_tensor(key)
    else:
        import torch

        blob = torch.load(args.weights, map_location="cpu", weights_only=False)
        state = blob.get("state_dict", blob)
        tensors = {k: v.numpy() for k, v in state.items() if hasattr(v, "numpy")}

    cfg = DACConfig()
    params = convert_dac_params(tensors, cfg, prefix=args.prefix)
    os.makedirs(args.output_dir, exist_ok=True)
    with open(os.path.join(args.output_dir, "dac_params.pkl"), "wb") as f:
        pickle.dump(params, f)
    n = sum(np.asarray(x).size for x in __import__("jax").tree.leaves(params))
    print(f"converted {n/1e6:.1f}M params -> {args.output_dir}")

    if args.push_to:
        try:
            from huggingface_hub import HfApi

            HfApi().upload_folder(folder_path=args.output_dir, repo_id=args.push_to)
        except ImportError:
            print("huggingface_hub not installed; skipping push")


if __name__ == "__main__":
    main()
