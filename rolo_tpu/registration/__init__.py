from .gicp import GICPContext, Correspondences, make_context, update_correspondences
from .lm import LMResult, CTResult, lm_register_rotation, lm_register_se3, lm_translation
from .rotgicp import ScanPairResult, register_scan_pair, register_se3

__all__ = [
    "GICPContext",
    "Correspondences",
    "make_context",
    "update_correspondences",
    "LMResult",
    "CTResult",
    "lm_register_rotation",
    "lm_register_se3",
    "lm_translation",
    "ScanPairResult",
    "register_scan_pair",
    "register_se3",
]
