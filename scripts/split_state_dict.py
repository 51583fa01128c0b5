"""Split a monolithic torch checkpoint into feature_net.pth / stereo_net.pth
(reference scripts/split_state_dict.py contract — upstream StereoNet releases
ship one state dict with 'feature_extraction.*' / net-prefixed keys).

Usage: python scripts/split_state_dict.py --input model.pth --output_dir weights/
"""

from __future__ import annotations

import argparse
import os


def split_state_dict(input_path: str, output_dir: str,
                     feature_prefixes=("feature_net.", "feature_extraction.")):
    import torch

    sd = torch.load(input_path, map_location="cpu")
    if "state_dict" in sd:
        sd = sd["state_dict"]

    feature, stereo = {}, {}
    for key, value in sd.items():
        name = key[7:] if key.startswith("module.") else key
        for p in feature_prefixes:
            if name.startswith(p):
                feature[name[len(p):]] = value
                break
        else:
            if "." in name:
                stereo[name.split(".", 1)[1] if name.startswith("stereo_net.") else name] = value

    os.makedirs(output_dir, exist_ok=True)
    torch.save(feature, os.path.join(output_dir, "feature_net.pth"))
    torch.save(stereo, os.path.join(output_dir, "stereo_net.pth"))
    print(f"feature_net: {len(feature)} tensors, stereo_net: {len(stereo)} tensors -> {output_dir}")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True)
    p.add_argument("--output_dir", required=True)
    a = p.parse_args()
    split_state_dict(a.input, a.output_dir)
