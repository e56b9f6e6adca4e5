from visiontransformer_tpu.utils.csvlog import CSVLogger

__all__ = ["CSVLogger"]
