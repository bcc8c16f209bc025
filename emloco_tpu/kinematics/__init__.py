from .skeleton import SkeletonTree, forward_kinematics, local_from_global  # noqa: F401
