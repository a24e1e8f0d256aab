"""Validate every checkpoint in a folder.

Counterpart of /root/reference/validate_checkpoints.py:37-72 — the
checkpoints-folder variant of multi-checkpoint evaluation.  Delegates to
evaluate_multiple_checkpoints with an explicit checkpoint directory.

Usage:
  python -m video_learning_tpu.tools.validate_checkpoints \\
      <config.yml> <checkpoints_dir> [--subprocess]
"""

import argparse

from video_learning_tpu.tools.evaluate_multiple_checkpoints import evaluate
from video_learning_tpu.utils import ensure_console_logging


def main(argv=None):
    ensure_console_logging()
    parser = argparse.ArgumentParser()
    parser.add_argument("config")
    parser.add_argument("checkpoints_dir")
    parser.add_argument("--subprocess", action="store_true")
    args = parser.parse_args(argv)
    return evaluate(args.config, checkpoints_dir=args.checkpoints_dir,
                    use_subprocess=args.subprocess)


if __name__ == "__main__":
    main()
