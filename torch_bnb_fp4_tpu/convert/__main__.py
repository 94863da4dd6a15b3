"""CLI: python -m torch_bnb_fp4_tpu.convert <hf_model_dir> <out_dir>
         [--quant-type fp4|nf4] [--quantize-lm-head]"""

import argparse

from .hf import convert_hf_model


def main():
    ap = argparse.ArgumentParser(description="HF checkpoint -> packed FP4 checkpoint")
    ap.add_argument("model_dir")
    ap.add_argument("out_dir")
    ap.add_argument("--quant-type", default="fp4", choices=["fp4", "nf4"])
    ap.add_argument("--variant", default="ramp", choices=["ramp", "zramp", "exact"],
                    help="fp4 pairk codebook: ramp = fastest decode (default, "
                    "slightly more accurate than exact FP4); exact = bit-exact "
                    "bnb FP4 codes")
    ap.add_argument("--quantize-lm-head", action="store_true")
    ap.add_argument("--quantize-embed", action="store_true",
                    help="quantize the token-embedding table too (FP4/NF4 "
                    "LUT-decoded at lookup; Mistral-7B saves ~190 MB HBM)")
    ap.add_argument("--ignore", action="append", default=[],
                    help="substring of layer names to keep unquantized "
                    "(repeatable) — reference ignore_layer_names parity")
    ap.add_argument("--requantize", action="store_true",
                    help="bitsandbytes-serialized sources only: dequantize the "
                    "stored codes exactly and quantize FRESH to --quant-type/"
                    "--variant instead of importing them.  The serving-speed "
                    "path for NF4 checkpoints (ramp GEMV decodes ~4.7x faster "
                    "than the NF4 LUT on v5e) at a measured 1.26x the "
                    "direct-ramp weight error (NF4 source; fp4 source 1.15x)")
    args = ap.parse_args()
    if args.quant_type == "fp4" and args.variant != "exact":
        print(
            f"note: variant={args.variant!r} remaps the FP4 codebook at pack time "
            "(faster decode, measured slightly more accurate on Gaussian weights) — "
            "the stored codes are NOT bit-exact bnb FP4; use --variant exact for "
            "strict bnb parity."
        )
    convert_hf_model(
        args.model_dir,
        args.out_dir,
        quant_type=args.quant_type,
        quantize_lm_head=args.quantize_lm_head,
        quantize_embed=args.quantize_embed,
        ignore=tuple(args.ignore),
        variant=args.variant,
        requantize=args.requantize,
    )


if __name__ == "__main__":
    main()
