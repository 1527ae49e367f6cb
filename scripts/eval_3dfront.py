"""Reference-named entry point: evaluation CLI.

Thin wrapper over echoscene_tpu.eval.cli: constraint-accuracy evaluation over
the test split with optional shape generation, SDF dumps, and render output.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from echoscene_tpu.eval.cli import main  # noqa: E402

if __name__ == "__main__":
    main()
