"""API layer: dispatch + validation + health (SURVEY.md §2 A4/A5/A10).

The reference routes RPC-over-POST: the resource path's two segments
become (taskType, method) (``lambda_function.py:133-135``) and an
if/elif chain dispatches to create/read/update/delete/health, with
unknown routes → 404 (:161-162).  The gateway validates only that the
``tasktype`` query param is present (``swagger/…yaml:268-271``;
``validateRequestBody: false``) — body payloads stay untyped, which is
why catalog ``attrs`` is a JSON-string passthrough column.
"""

from __future__ import annotations

from typing import Any

from .catalog import ENTITY_TYPES, Catalog

_METHODS = ("create", "read", "update", "delete", "health")

# swagger paths use bare entity names (/sourcesystem etc.); map both.
_PATH_ALIASES = {
    "sourcesystem": "source_system",
    "targetsystem": "target_system",
    "dataasset": "data_asset",
    **{e: e for e in ENTITY_TYPES},
}


def health() -> dict:
    """A5: liveness probe (``lambda_function.py:142-143``)."""
    return {"statusCode": 200, "body": "API health is ok"}


def dispatch(catalog: Catalog, resource_path: str, payload: dict[str, Any] | None = None,
             tasktype: str | None = None) -> dict:
    """Route ``/<entity>/<method>`` to the catalog op.

    Mirrors the reference's contract, including its quirk: ``tasktype``
    is VALIDATED for presence (gateway behavior) but routing uses the
    path (``lambda_function.py:133-141`` parses taskType then only
    prints it).  Unknown entity or method → 404 (:161-162)."""
    if tasktype is None:
        return {"statusCode": 400, "body": "missing required querystring: tasktype"}
    parts = [p for p in resource_path.split("/") if p]
    if len(parts) == 1 and parts[0] == "health":
        return health()
    if len(parts) != 2:
        return {"statusCode": 404, "body": f"no such route: {resource_path}"}
    raw_entity, method = parts
    entity = _PATH_ALIASES.get(raw_entity)
    if entity is None or method not in _METHODS:
        return {"statusCode": 404, "body": f"no such route: {resource_path}"}
    if method == "health":
        return health()
    payload = payload or {}
    if method == "create":
        return catalog.create(
            entity,
            int(payload["entity_id"]),
            payload.get("name", ""),
            payload.get("attrs"),
        )
    if method == "read":
        df = catalog.read(entity, int(payload["entity_id"]))
        rows = [r.asDict() for r in df.collect()]
        return {"statusCode": 200 if rows else 404, "body": rows}
    if method == "update":
        return catalog.update(
            entity,
            int(payload["entity_id"]),
            name=payload.get("name"),
            attrs=payload.get("attrs"),
            status=payload.get("status"),
        )
    return catalog.delete(entity, int(payload["entity_id"]))
