"""Convert a local HF torch checkpoint directory to mpmc_tpu flax params.

Usage:
  python tools/convert_hf.py --checkpoint /path/to/arabertv2 \
      --preset arabertv2 --out arabert_params.msgpack

The output msgpack loads via ``flax.serialization.from_bytes`` into
``TextEncoder`` variables (see ``baselines/extract_features.py
--text-params`` and the experiment drivers).  Presets mirror the reference's
text-model zoo (``textmodel_example_task2A.py:41-44``).
"""

import argparse
import sys

sys.path.insert(0, ".")

from mpmc_tpu.config import TextEncoderConfig  # noqa: E402

PRESETS = {
    "arabertv2": TextEncoderConfig.arabertv2,
    "qarib": TextEncoderConfig.qarib,
    "roberta-base": TextEncoderConfig.roberta_base,
    "distilbert-multilingual": TextEncoderConfig.distilbert_multilingual,
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", required=True,
                    help="local HF checkpoint dir (pytorch_model.bin or "
                         "model.safetensors + config.json)")
    ap.add_argument("--preset", choices=sorted(PRESETS), required=True)
    ap.add_argument("--out", required=True, help="output .msgpack path")
    args = ap.parse_args()

    from flax import serialization
    from mpmc_tpu.models.hf_convert import convert_checkpoint_dir

    cfg = PRESETS[args.preset]()
    params = convert_checkpoint_dir(args.checkpoint, cfg)
    blob = serialization.to_bytes({"params": params})
    with open(args.out, "wb") as f:
        f.write(blob)
    print(f"wrote {args.out} ({len(blob) / 1e6:.1f} MB)")


if __name__ == "__main__":
    main()
