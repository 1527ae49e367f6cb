"""Reference-named entry point: training CLI.

Thin wrapper over echoscene_tpu.train.cli so reference users find the same
command shape: python scripts/train_3dfront.py --exp ... --dataset ...
--network_type echoscene --with_SDF True --diff_yaml configs/full_mp.yaml
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from echoscene_tpu.train.cli import main  # noqa: E402

if __name__ == "__main__":
    main()
