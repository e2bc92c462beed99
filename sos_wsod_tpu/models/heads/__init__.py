"""WSOD head families (SURVEY.md §2.1)."""
from .cmil import CMILROIHead
from .contextlocnet import ContextLocNetROIHead
from .csc import CSCROIHead
from .oicr_plus import OICRPlusHead
from .pcl import PCLROIHead
from .single_view import OICRROIHead, WSDDNROIHead
from .uwsod import UWSODROIHead
from .wsjds import WSJDSROIHead

__all__ = [
    "CMILROIHead", "ContextLocNetROIHead", "CSCROIHead", "OICRPlusHead",
    "PCLROIHead", "OICRROIHead", "WSDDNROIHead", "UWSODROIHead",
    "WSJDSROIHead",
]
