"""Root logger (`mmdet/utils/logger.py:6 get_root_logger` analogue)."""

import logging

_initialized = False


def get_root_logger(log_file=None, log_level=logging.INFO) -> logging.Logger:
    global _initialized
    logger = logging.getLogger("panoswin_tpu")
    if not _initialized:
        fmt = logging.Formatter(
            "%(asctime)s - %(name)s - %(levelname)s - %(message)s")
        sh = logging.StreamHandler()
        sh.setFormatter(fmt)
        logger.addHandler(sh)
        logger.setLevel(log_level)
        _initialized = True
    if log_file:
        fh = logging.FileHandler(log_file)
        fh.setFormatter(logging.Formatter(
            "%(asctime)s - %(name)s - %(levelname)s - %(message)s"))
        logger.addHandler(fh)
    return logger
