"""Real-data readiness drill (VERDICT r3 item 4) — ONE command that proves
the paper-parity pipeline runs end-to-end through the REAL file loaders:

  python scripts/run_readiness_drill.py [--log artifacts/readiness_r4/drill.log]

Steps:
  1. scripts/make_readiness_minidata.py writes mini on-disk datasets at the
     vendored split-manifest paths (PNG/JPG images, PFM + 16-bit-depth-PNG
     disparities written through data/io.py / cv2) plus init checkpoints.
  2. scripts/run_paper_suite.py runs 2 environments x 4 methods x 50 steps
     against those mounts — the identical command shape a real-data parity
     run uses; only the roots and the reduced-scale flags differ.

Exit 0 = every method of every environment ran to completion and produced a
trials.csv through the real dataset layer. The committed log is the drill
evidence.
"""

import argparse
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(cmd, log_f):
    print(f"\n$ {' '.join(cmd)}", flush=True)
    log_f.write(f"\n$ {' '.join(cmd)}\n")
    log_f.flush()
    proc = subprocess.Popen(cmd, stdout=subprocess.PIPE,
                            stderr=subprocess.STDOUT, text=True)
    for line in proc.stdout:
        sys.stdout.write(line)
        log_f.write(line)
    proc.wait()
    log_f.flush()
    return proc.returncode


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", default="/tmp/readiness_data")
    ap.add_argument("--log", default="artifacts/readiness_r4/drill.log")
    ap.add_argument("--num_steps", type=int, default=50)
    ap.add_argument("--frames", type=int, default=96)
    args = ap.parse_args()

    log_path = os.path.join(REPO, args.log) if not os.path.isabs(args.log) \
        else args.log
    os.makedirs(os.path.dirname(log_path), exist_ok=True)
    py = sys.executable

    with open(log_path, "w") as log_f:
        rc = run([py, os.path.join(REPO, "scripts/make_readiness_minidata.py"),
                  "--out", args.data, "--frames", str(args.frames)], log_f)
        if rc != 0:
            print("mini-data generation FAILED", file=sys.stderr)
            return rc

        rc = run([py, os.path.join(REPO, "scripts/run_paper_suite.py"),
                  "--sceneflow", os.path.join(args.data, "sceneflow"),
                  "--vkitti", os.path.join(args.data, "vkitti"),
                  "--kitti_raw", os.path.join(args.data, "kitti_raw"),
                  "--sf_weights", os.path.join(args.data, "weights", "sf"),
                  "--vk_weights", os.path.join(args.data, "weights", "vk"),
                  # All 10 paper environments (VERDICT r4 item 6).
                  "--environments",
                  "flying_to_vk01", "flying_to_vk20", "flying_to_campus",
                  "flying_to_city", "flying_to_road", "clone_to_fog",
                  "clone_to_rain", "clone_to_campus", "clone_to_city",
                  "clone_to_road",
                  "--num_steps", str(args.num_steps),
                  "--height", "64", "--width", "96",
                  "--eval_hz", "25", "--ovs_validate_hz", "10",
                  "--log_dir", os.path.join(args.data, "logs")], log_f)
        if rc != 0:
            print("paper suite drill FAILED", file=sys.stderr)
            return rc
        log_f.write("\nREADINESS DRILL PASSED\n")
    print(f"\nREADINESS DRILL PASSED — log: {log_path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
