"""Standalone evaluation entry (the reference's eval.py is broken; this
one works — see tcam_wsol_video_tpu/cli/evaluate.py)."""
from tcam_wsol_video_tpu.cli.evaluate import main

if __name__ == "__main__":
    main()
