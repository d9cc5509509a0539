"""CLI: python -m hotrack_tpu.test --config <name>.yml [--save]
(README.md:106-114 surface). Routes on cfg['track']: False -> single-frame
eval; 'hand'/'hand_IKNet' -> hand tracking; 'obj_opt' -> object tracking."""

from hotrack_tpu.train.cli import test_main

if __name__ == "__main__":
    test_main()
