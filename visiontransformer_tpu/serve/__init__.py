from visiontransformer_tpu.serve.store import JobStore
from visiontransformer_tpu.serve.server import create_server, ServingApp

__all__ = ["JobStore", "create_server", "ServingApp"]
