from .rotations import rot, rot_y, rot_z

__all__ = ["rot", "rot_y", "rot_z"]
