"""Interactive chat CLI over the MSD engine (LLaVA/llava/serve/cli.py
analog).

The reference's cli.py loads a model + one image, then loops: read a user
turn, append it to the vicuna conversation, stream the assistant reply
token-by-token (TextStreamer), append the reply back into the conversation
(llava/serve/cli.py:39-126). Same protocol here, TPU-native underneath:
segments stream from the engine's bounded decode programs
(spec_engine.decode_until), token-identical to a non-streaming run.

Usage:
  python -m msd_tpu.serve.cli --pretrained <ckpt> --msd_model_path <draft> \
      [--image photo.jpg] [--temperature 0.2] [--max-new-tokens 512]
  python -m msd_tpu.serve.cli --tiny            # random tiny stack (smoke)

Type a message and press enter; 'exit' or EOF quits.
"""

from __future__ import annotations

import argparse
import sys
from typing import Optional

from msd_tpu.utils.conversation import vicuna_v1
from msd_tpu.utils.mm_utils import DEFAULT_IMAGE_TOKEN


def chat_once(adapter, conv, text: str, feats, sp, max_new: int,
              out=None) -> str:
    """Run one user turn through the conversation + engine; returns the
    assistant reply (and streams segments to ``out`` as they decode)."""
    import numpy as np

    from msd_tpu.utils.mm_utils import tokenizer_image_token

    conv.append_message(conv.roles[0], text)
    conv.append_message(conv.roles[1], None)
    prompt = conv.get_prompt()
    ids = tokenizer_image_token(prompt, adapter.tokenizer)
    pieces = []
    prev = ""
    for seg in adapter.gen.generate_stream(np.asarray(ids, np.int32),
                                           img_feats=feats,
                                           max_new_tokens=max_new, sp=sp):
        pieces.extend(list(seg))
        cur = adapter.tokenizer.decode(pieces, skip_special_tokens=True)
        if out is not None:
            out.write(cur[len(prev):])
            out.flush()
        prev = cur
    reply = prev.strip()
    # replace the open slot with the actual reply so the next turn sees it
    conv.messages[-1] = (conv.roles[1], reply)
    return reply


def _load_adapter(args):
    from msd_tpu.harness.models.llava_msd import LlavaMSD
    if args.tiny:
        return LlavaMSD.from_tiny(use_msd=not args.no_msd)
    if not args.pretrained:
        raise SystemExit("--pretrained (or --tiny) is required")
    return LlavaMSD.from_pretrained(args.pretrained, args.msd_model_path,
                                    use_msd=not args.no_msd,
                                    max_new_tokens=args.max_new_tokens)


def main(argv=None):
    ap = argparse.ArgumentParser("msd_tpu.serve.cli")
    ap.add_argument("--pretrained", default=None)
    ap.add_argument("--msd_model_path", default=None)
    ap.add_argument("--tiny", action="store_true",
                    help="random tiny stack (no checkpoints)")
    ap.add_argument("--image", default=None, help="image file for the chat")
    ap.add_argument("--no-msd", action="store_true",
                    help="plain AR decoding instead of speculative")
    ap.add_argument("--temperature", type=float, default=0.0)
    ap.add_argument("--top_p", type=float, default=1.0)
    ap.add_argument("--max-new-tokens", type=int, default=512)
    args = ap.parse_args(argv)

    adapter = _load_adapter(args)
    sp = adapter._sp({"temperature": args.temperature, "top_p": args.top_p})

    feats = None
    if args.image:
        from PIL import Image
        img = Image.open(args.image).convert("RGB")
        from msd_tpu.utils.mm_utils import process_image
        import jax.numpy as jnp
        px = process_image(img, image_size=adapter.image_size)
        if adapter.encode_image_fn is None:
            raise SystemExit("model has no vision encoder")
        feats = adapter.encode_image_fn(jnp.asarray(px))

    conv = vicuna_v1()
    first_turn = True
    print("chat ready ('exit' to quit)", file=sys.stderr)
    while True:
        try:
            text = input(f"{conv.roles[0]}: ")
        except EOFError:
            break
        if text.strip().lower() in ("exit", "quit"):
            break
        if not text.strip():
            continue
        if first_turn and feats is not None:
            # image token goes into the first user message only
            # (llava/serve/cli.py:74-82)
            text = DEFAULT_IMAGE_TOKEN + "\n" + text
        first_turn = False
        sys.stdout.write(f"{conv.roles[1]}: ")
        chat_once(adapter, conv, text, feats, sp, args.max_new_tokens,
                  out=sys.stdout)
        sys.stdout.write("\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
