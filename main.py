"""Train entry (reference-compatible surface: /root/reference/main.py)."""
from tcam_wsol_video_tpu.cli.train import main

if __name__ == "__main__":
    main()
