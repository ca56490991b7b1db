"""Engine error taxonomy.

Parity with the reference's two error enums (`/root/reference/src/errors.rs:15-47`):
``ProcessorError`` {Io, Json, Schema, Parquet} and ``ApiError``
{InvalidUrl, Request, HttpStatus, Io, EmptyResponse}, re-expressed as a
Python exception hierarchy. The pipeline's fail-soft policy
(`/root/reference/src/main.rs:89-104`) catches ``EngineError`` per
endpoint and continues; config errors are fatal
(`/root/reference/src/main.rs:41-47`).
"""

from __future__ import annotations


class EngineError(Exception):
    """Base for all engine errors."""


class ConfigError(EngineError):
    """Invalid/missing job-spec (parity: models.rs:66-82 validation)."""


class ProcessorError(EngineError):
    """Transform-side failure (parity: errors.rs ProcessorError)."""


class SchemaError(ProcessorError):
    """Empty table / unusable schema (parity: processor.rs:31-35)."""


class ApiError(EngineError):
    """Extract-side failure (parity: errors.rs ApiError)."""


class InvalidUrlError(ApiError):
    """Non-HTTPS or malformed URL (parity: api.rs:61-66)."""


class HttpStatusError(ApiError):
    """Non-2xx response (parity: api.rs:81-87)."""

    def __init__(self, status: int, url: str):
        super().__init__(f"HTTP {status} for {url}")
        self.status = status
        self.url = url


class EmptyResponseError(ApiError):
    """Zero-byte download (parity: api.rs:109-113)."""
