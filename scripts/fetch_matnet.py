"""Fetch + convert + validate the real MaterialNet checkpoint.

The reference downloads `Lez/MatNet / matnet_weights.pth` from HuggingFace
(inverse_img_w_mi.py:648-652). This environment has no network egress, so
this script is the complete recipe for when egress exists:

    python scripts/fetch_matnet.py [--out weights/matnet_weights.pth]

1. downloads the checkpoint (huggingface_hub, falling back to raw https),
2. records/verifies its sha256 (pin updated on first successful fetch),
3. converts it with models/convert.py and runs the Flax forward,
4. if /root/reference fixtures are present, reports map-level PSNR of
   our MaterialNet predictions vs the shipped *Pred.exr files for the
   indoor scene — the acceptance check for "real weights work".

The conversion layout itself is already pinned by
tests/test_matnet_reference_parity.py, which round-trips the reference's
own torch implementation; this script only adds the download.
"""

import argparse
import hashlib
import json
import os
import sys

REPO_ID = "Lez/MatNet"
FILENAME = "matnet_weights.pth"
# sha256 of the published checkpoint; empty until the first successful
# fetch records it (no egress in the build environment).
PINNED_SHA256 = ""
PIN_FILE = os.path.join(os.path.dirname(__file__), "matnet_sha256.json")


def sha256(path, chunk=1 << 20):
    h = hashlib.sha256()
    with open(path, "rb") as f:
        while True:
            b = f.read(chunk)
            if not b:
                break
            h.update(b)
    return h.hexdigest()


def fetch(out_path):
    try:
        from huggingface_hub import hf_hub_download
        p = hf_hub_download(repo_id=REPO_ID, filename=FILENAME,
                            repo_type="model")
        if os.path.abspath(p) != os.path.abspath(out_path):
            import shutil
            os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
            shutil.copy(p, out_path)
        return out_path
    except Exception as e:
        print(f"hf_hub_download failed ({e}); trying raw https")
    import urllib.request
    url = (f"https://huggingface.co/{REPO_ID}/resolve/main/{FILENAME}")
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    urllib.request.urlretrieve(url, out_path)
    return out_path


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="weights/matnet_weights.pth")
    ap.add_argument("--skip-validate", action="store_true")
    args = ap.parse_args()

    path = args.out if os.path.exists(args.out) else fetch(args.out)
    digest = sha256(path)
    pinned = PINNED_SHA256
    if os.path.exists(PIN_FILE):
        pinned = json.load(open(PIN_FILE)).get("sha256", pinned)
    if pinned and digest != pinned:
        print(f"FATAL: sha256 mismatch: got {digest}, pinned {pinned}")
        return 1
    if not pinned:
        json.dump({"repo": REPO_ID, "file": FILENAME, "sha256": digest},
                  open(PIN_FILE, "w"), indent=2)
        print(f"recorded sha256 pin {digest} -> {PIN_FILE}")

    if args.skip_validate:
        print(f"OK: {path} ({digest[:12]}…)")
        return 0

    import numpy as np
    from materialist_tpu.models.convert import load_matnet_params
    from materialist_tpu.models.matnet import MatNetInference

    params = load_matnet_params(path)
    net = MatNetInference(params=params)
    print("converted; running forward smoke test")
    maps = net.infer_image(np.random.default_rng(0).random(
        (512, 512, 3), dtype=np.float32))
    for k, v in maps.items():
        assert np.isfinite(v).all(), k
    print("forward OK:", {k: v.shape for k, v in maps.items()})

    fixture = "/root/reference/output_imgs/indoor"
    if os.path.isdir(fixture):
        from materialist_tpu.io import exr, image as image_io
        gt_img = image_io.read(os.path.join(fixture, "gt_image.png"))
        pred = net.infer_image(np.asarray(gt_img[..., :3], np.float32))
        print("map-level PSNR vs shipped *Pred.exr fixtures:")
        for k, fname in (("albedo", "albedoPred.exr"),
                         ("normal", "normalPred.exr"),
                         ("depth", "depthPred.exr")):
            ref = exr.read(os.path.join(fixture, fname))
            ref = ref[..., 0] if pred[k].ndim == 2 else ref[..., :3]
            mse = float(np.mean((pred[k] - ref) ** 2))
            rng2 = float(ref.max() - ref.min()) or 1.0
            psnr = 10 * np.log10(rng2 ** 2 / max(mse, 1e-12))
            print(f"  {k:10s} {psnr:6.2f} dB")
    return 0


if __name__ == "__main__":
    sys.exit(main())
