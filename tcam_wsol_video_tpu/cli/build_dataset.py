"""Offline dataset-preparation CLI: raw release -> wsol-done-right folds.

The reference drives its builders from __main__ blocks
(/root/reference/dlib/datasets/_video_ds_ytov1_0.py:1435,
_video_ds_ytov2_2.py, _video_ds_yt_bb.py:1535); here they are one
command:

  python -m tcam_wsol_video_tpu.cli.build_dataset yto \
      --raw_root /data/YouTube-Objects-v1.0 --out folds/YTOv1 \
      --version v1.0
  python -m tcam_wsol_video_tpu.cli.build_dataset ytbb \
      --csv_train yt_bb_detection_train.csv \
      --csv_validation yt_bb_detection_validation.csv \
      --frames_root /data/ytbb_frames --out folds/YTBB
"""
from __future__ import annotations

import argparse


def main(argv=None) -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    sub = ap.add_subparsers(dest="cmd", required=True)

    yto = sub.add_parser("yto", help="YouTube-Objects v1.0 / v2.2 release")
    yto.add_argument("--raw_root", required=True)
    yto.add_argument("--out", required=True)
    yto.add_argument("--version", default="v1.0", choices=["v1.0", "v2.2"])
    yto.add_argument("--seed", type=int, default=0)

    bb = sub.add_parser("ytbb", help="YouTube-BoundingBoxes detection CSVs")
    bb.add_argument("--csv_train", required=True)
    bb.add_argument("--csv_validation", required=True)
    bb.add_argument("--frames_root", required=True)
    bb.add_argument("--out", required=True)
    bb.add_argument("--k_val", type=int, default=3,
                    help="held-out train videos per class for the val split")
    bb.add_argument("--seed", type=int, default=0)

    args = ap.parse_args(argv)
    from tcam_wsol_video_tpu.data import builders
    if args.cmd == "yto":
        class_id = builders.build_metadata(args.raw_root, args.out,
                                           version=args.version,
                                           seed=args.seed)
    else:
        class_id = builders.build_ytbb_metadata(
            args.csv_train, args.csv_validation, args.frames_root,
            args.out, k_val=args.k_val, seed=args.seed)
    print(f"folds written to {args.out}: {len(class_id)} classes "
          f"{sorted(class_id)}")


if __name__ == "__main__":
    main()
