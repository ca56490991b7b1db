"""TOML job-spec model — parity with the reference's config layer
(/root/reference/src/models.rs:21-115).

The reference drives its whole pipeline from a TOML file mapping
APIs -> endpoint groups -> routes, each group optionally carrying a
``root_path`` (the envelope key holding the record list). We keep that
exact declarative shape: the spec is *interpreted* by the Python
driver loop (pipeline.py), while all data work is Spark plans.

Validation is fail-fast at load (models.rs:66-82): a bad spec kills
the job before any network or cluster work starts; per-endpoint errors
later are fail-soft (pipeline.py).
"""

from __future__ import annotations

import tomllib
from dataclasses import dataclass, field

from rust_etl_spark.errors import ConfigError


@dataclass(frozen=True)
class EndpointGroup:
    """One API group: a set of named routes + normalization hints
    (models.rs EndpointGroup)."""

    routes: dict[str, str]
    root_path: str | None = None  # envelope key holding the records
    technical_columns: tuple[str, ...] | None = None  # override of drop list


@dataclass(frozen=True)
class Api:
    """One upstream API: base_url + its endpoint groups (models.rs Api)."""

    base_url: str
    groups: dict[str, EndpointGroup] = field(default_factory=dict)


@dataclass(frozen=True)
class Config:
    apis: dict[str, Api]

    @staticmethod
    def load_from_file(path: str) -> "Config":
        """Read + parse + validate (models.rs:56-63 load_from_file)."""
        try:
            with open(path, "rb") as f:
                raw = tomllib.load(f)
        except OSError as e:
            raise ConfigError(f"cannot read config {path!r}: {e}") from e
        except tomllib.TOMLDecodeError as e:
            raise ConfigError(f"invalid TOML in {path!r}: {e}") from e
        return Config.from_dict(raw)

    @staticmethod
    def from_dict(raw: dict) -> "Config":
        apis: dict[str, Api] = {}
        for api_name, api_raw in raw.items():
            if not isinstance(api_raw, dict):
                raise ConfigError(f"api {api_name!r}: expected a table")
            base_url = api_raw.get("base_url")
            groups: dict[str, EndpointGroup] = {}
            for group_name, group_raw in api_raw.items():
                if group_name == "base_url":
                    continue
                if not isinstance(group_raw, dict):
                    raise ConfigError(f"{api_name}.{group_name}: expected a table")
                routes = {
                    k: v
                    for k, v in group_raw.items()
                    if k not in ("root_path", "technical_columns") and isinstance(v, str)
                }
                tech = group_raw.get("technical_columns")
                groups[group_name] = EndpointGroup(
                    routes=routes,
                    root_path=group_raw.get("root_path"),
                    technical_columns=tuple(tech) if tech is not None else None,
                )
            apis[api_name] = Api(base_url=base_url, groups=groups)
        cfg = Config(apis=apis)
        cfg.validate()
        return cfg

    def validate(self) -> None:
        """Fail-fast checks (models.rs:66-82): every API needs a
        non-empty https base_url; every group needs >= 1 route."""
        if not self.apis:
            raise ConfigError("config has no APIs")
        for api_name, api in self.apis.items():
            if not api.base_url or not isinstance(api.base_url, str):
                raise ConfigError(f"api {api_name!r}: missing base_url")
            if not api.base_url.startswith("https://"):
                raise ConfigError(f"api {api_name!r}: base_url must be https:// (got {api.base_url!r})")
            if not api.groups:
                raise ConfigError(f"api {api_name!r}: no endpoint groups")
            for group_name, group in api.groups.items():
                if not group.routes:
                    raise ConfigError(f"{api_name}.{group_name}: no routes")


def join_urls(base: str, path: str) -> str:
    """Join trimming duplicate slashes (models.rs:109-114 join_urls)."""
    return base.rstrip("/") + "/" + path.lstrip("/")


def resolve_endpoint_url(config: Config, api: str, group: str, key: str) -> str:
    """Base + route resolution (models.rs:85-107)."""
    try:
        route = config.apis[api].groups[group].routes[key]
    except KeyError as e:
        raise ConfigError(f"unknown endpoint {api}.{group}.{key}") from e
    return join_urls(config.apis[api].base_url, route)


def is_templated(url: str) -> bool:
    """Routes with path parameters (``{id}``) are skipped by the
    pipeline (main.rs:79-81)."""
    return "{" in url
