from .cfg_node import CfgNode
from .defaults import get_default_cfg
from .project_manager import ProjectManager

__all__ = ["CfgNode", "get_default_cfg", "ProjectManager"]
