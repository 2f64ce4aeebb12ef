"""Export CLIP text embeddings of the PPT class vocabulary to .npy.

The reference encodes class names with CLIP at model-construction time
(`point_prompt_training_v1m1_language_guided.py:184-196`); this image has
no CLIP weights or network egress, so PPT-v1m1 instead loads a
precomputed table via ``class_embedding_path``. Run this script once in an
environment with `clip` or `open_clip_torch` installed:

    python tools/export_clip_embeddings.py --out clip_text_36.npy \
        --model ViT-B/16 --template "[x]"

and point ``model.class_embedding_path`` at the output. Rows follow
`cdsegnet_tpu.models.ppt.DEFAULT_CLASS_NAMES` (pass --names to override).
"""

import argparse
import sys

sys.path.insert(0, ".")

import numpy as np

from cdsegnet_tpu.models.ppt import DEFAULT_CLASS_NAMES


def encode(names, model_name, template):
    prompts = [template.replace("[x]", n) for n in names]
    try:
        import clip
        import torch

        model, _ = clip.load(model_name, device="cpu")
        with torch.no_grad():
            emb = model.encode_text(clip.tokenize(prompts)).float()
    except ImportError:
        try:
            import open_clip
            import torch

            model, _, _ = open_clip.create_model_and_transforms(
                model_name.replace("/", "-"), pretrained="openai"
            )
            tokenizer = open_clip.get_tokenizer(model_name.replace("/", "-"))
            with torch.no_grad():
                emb = model.encode_text(tokenizer(prompts)).float()
        except ImportError:
            raise SystemExit(
                "Neither `clip` nor `open_clip_torch` is installed; run this "
                "script in an environment with one of them."
            )
    emb = emb / emb.norm(dim=-1, keepdim=True)
    return emb.numpy().astype(np.float32)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--model", default="ViT-B/16")
    ap.add_argument("--template", default="[x]")
    ap.add_argument("--names", nargs="*", default=None,
                    help="class names; defaults to the PPT 36-name vocabulary")
    args = ap.parse_args()
    names = args.names or list(DEFAULT_CLASS_NAMES)
    emb = encode(names, args.model, args.template)
    np.save(args.out, emb)
    print(f"wrote {emb.shape} to {args.out}")


if __name__ == "__main__":
    main()
