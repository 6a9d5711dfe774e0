from airfoil_tpu.api import handlers
from airfoil_tpu.api.minihttp import make_server, serve

__all__ = ["handlers", "make_server", "serve"]
