"""Convert facenet_pytorch MTCNN weights (pnet.pt / rnet.pt / onet.pt state
dicts) into the npz layout eav_tpu's Flax MTCNN loads.

The reference runs facenet_pytorch's MTCNN inside its vision decode loop
(`Dataload_vision.py:25-29`); this one-time conversion lets the Flax cascade
(eav_tpu/models/mtcnn.py) run the same weights batched on TPU.

Usage:
  python scripts/convert_mtcnn.py --src <dir with {p,r,o}net.pt> --out <dir>
  export EAV_TPU_MTCNN_WEIGHTS=<out dir>
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from eav_tpu.models.mtcnn import _flatten_tree, convert_facenet_state_dict


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--src", required=True, help="dir containing pnet.pt/rnet.pt/onet.pt")
    p.add_argument("--out", required=True, help="output dir for pnet.npz/rnet.npz/onet.npz")
    args = p.parse_args(argv)
    import torch

    os.makedirs(args.out, exist_ok=True)
    for net in ("pnet", "rnet", "onet"):
        sd = torch.load(
            os.path.join(args.src, f"{net}.pt"), map_location="cpu", weights_only=True
        )
        tree = convert_facenet_state_dict(net, sd)
        flat = _flatten_tree(tree)
        np.savez(os.path.join(args.out, f"{net}.npz"), **flat)
        print(f"{net}: {len(flat)} tensors -> {args.out}/{net}.npz")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
