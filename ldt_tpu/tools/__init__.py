"""Host-side utilities: config, logging, misc."""

from ldt_tpu.tools.io import dict2namespace, makedirs, namespace2dict

__all__ = ["dict2namespace", "makedirs", "namespace2dict"]
