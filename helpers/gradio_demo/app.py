"""Gradio demo: prompt + description textboxes -> audio widget.

Equivalent of `/root/reference/helpers/gradio_demo/app.py:40-105` (fixed seed,
two textboxes, examples). Requires `gradio` (not baked into the TPU image —
the demo degrades to a CLI loop without it).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np

DEFAULT_DESCRIPTION = (
    "A female speaker with a slightly low-pitched voice delivers her words quite "
    "expressively, in a very confined sounding environment with clear audio quality."
)
DEFAULT_PROMPT = "Hey, how are you doing today?"
SEED = 42


def load_pipeline(path: str, speculative_window=None):
    from parler_tts_tpu.runtime.pipeline import ParlerTTSPipeline

    return ParlerTTSPipeline.from_pretrained(
        path, speculative_window=speculative_window
    )


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--model", type=str, required=True, help="checkpoint dir")
    parser.add_argument("--share", action="store_true")
    parser.add_argument(
        "--speculative_window", type=int, default=16,
        help="speculative decoding window (0 disables; INFERENCE.md)",
    )
    args = parser.parse_args()

    pipe = load_pipeline(
        args.model,
        speculative_window=args.speculative_window or None,
    )
    sr = pipe.config.sampling_rate

    def gen(prompt: str, description: str):
        audio, lengths = pipe.generate([description], [prompt], seed=SEED)
        return sr, np.asarray(audio[0, : lengths[0]])

    try:
        import gradio as gr
    except ImportError:
        print("gradio not installed; running CLI loop instead")
        while True:
            prompt = input("prompt> ") or DEFAULT_PROMPT
            desc = input("description> ") or DEFAULT_DESCRIPTION
            rate, wav = gen(prompt, desc)
            out = "/tmp/parler_tts_demo.wav"
            _write_wav(out, rate, wav)
            print(f"wrote {out} ({len(wav) / rate:.2f}s)")
        return

    demo = gr.Interface(
        fn=gen,
        inputs=[
            gr.Textbox(label="Prompt", value=DEFAULT_PROMPT),
            gr.Textbox(label="Description", value=DEFAULT_DESCRIPTION),
        ],
        outputs=gr.Audio(label="Generated speech"),
        title="Parler-TTS (TPU)",
    )
    demo.launch(share=args.share)


def _write_wav(path: str, rate: int, wav: np.ndarray):
    from parler_tts_tpu.native import write_wav

    write_wav(path, rate, np.asarray(wav, np.float32))


if __name__ == "__main__":
    main()
