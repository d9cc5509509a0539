from . import bbox, metrics, part_dof, pose_fit, procrustes, rotations
