"""Structured logging, actually wired to the runtime config.

The reference declares ``log_level`` / ``enable_logging`` in
``config/runtime_config.yaml:16-17`` but nothing reads them
(SURVEY.md §5.5); here :func:`setup_logging` consumes them and the
serving layer logs request lifecycle events with ids and timings.
"""

from __future__ import annotations

import json
import logging
import sys
import time
from typing import Any, Dict, Optional

from ..config import RuntimeConfig

LOGGER_NAME = "pagedattention_tpu"


class JsonFormatter(logging.Formatter):
    def format(self, record: logging.LogRecord) -> str:
        out: Dict[str, Any] = {
            "ts": round(record.created, 3),
            "level": record.levelname.lower(),
            "msg": record.getMessage(),
        }
        extra = getattr(record, "fields", None)
        if extra:
            out.update(extra)
        return json.dumps(out)


def setup_logging(runtime: Optional[RuntimeConfig] = None,
                  json_lines: bool = True) -> logging.Logger:
    runtime = runtime or RuntimeConfig()
    logger = logging.getLogger(LOGGER_NAME)
    logger.handlers.clear()
    if not runtime.enable_logging:
        logger.addHandler(logging.NullHandler())
        logger.disabled = True
        return logger
    logger.disabled = False
    handler = logging.StreamHandler(sys.stderr)
    if json_lines:
        handler.setFormatter(JsonFormatter())
    else:
        handler.setFormatter(logging.Formatter(
            "%(asctime)s %(levelname)s %(message)s"))
    logger.addHandler(handler)
    logger.setLevel(getattr(logging, runtime.log_level.upper(),
                            logging.INFO))
    return logger


def get_logger() -> logging.Logger:
    return logging.getLogger(LOGGER_NAME)


def log_event(msg: str, level: int = logging.INFO, **fields: Any) -> None:
    get_logger().log(level, msg, extra={"fields": fields})
