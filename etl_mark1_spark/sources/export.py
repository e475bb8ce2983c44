"""Export adapters — K7/K8/K10 in SURVEY.md §2.1.

The reference's adapters read the whole output file into driver memory and
POST it (webhook, export_adapters/builtin.py:12-42) or create Odoo records
one XML-RPC call per row from the driver (builtin.py:45-94). Neither survives
scale. Here both run via ``foreachPartition``: each executor task opens one
client and sends its partition in batches — no driver bottleneck, connection
count bounded by partition count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


class ExportAdapter:
    name = "base"

    def export(self, df: DataFrame, config: dict) -> None:
        raise NotImplementedError


class WebhookAdapter(ExportAdapter):
    """webhook (builtin.py:12-42): POST rows as JSON to a URL, batched per
    partition instead of one whole-file POST from the driver."""

    name = "webhook"

    def export(self, df: DataFrame, config: dict) -> None:
        url = config["url"]
        headers = dict(config.get("headers", {}))
        batch_size = int(config.get("batch_size", 500))
        timeout = float(config.get("timeout", 30.0))

        def send_partition(rows):
            import json
            import urllib.request

            batch = []

            def flush():
                if not batch:
                    return
                req = urllib.request.Request(
                    url,
                    data=json.dumps(batch, default=str).encode(),
                    method="POST",
                    headers={"Content-Type": "application/json", **headers},
                )
                urllib.request.urlopen(req, timeout=timeout).read()  # noqa: S310
                batch.clear()

            for row in rows:
                batch.append(row.asDict(recursive=True))
                if len(batch) >= batch_size:
                    flush()
            flush()

        df.foreachPartition(send_partition)


class OdooXmlRpcAdapter(ExportAdapter):
    """odoo_xmlrpc (builtin.py:45-94): authenticate once per partition, then
    ``execute_kw(model, 'create', [records])`` in batches — Odoo's create
    accepts a list, so this is rows/batch_size calls instead of one per row."""

    name = "odoo_xmlrpc"

    def export(self, df: DataFrame, config: dict) -> None:
        url = config["url"]
        db = config["db"]
        username = config["username"]
        password = config["password"]
        model = config["model"]
        batch_size = int(config.get("batch_size", 200))

        def send_partition(rows):
            import xmlrpc.client

            common = xmlrpc.client.ServerProxy(f"{url}/xmlrpc/2/common")
            uid = common.authenticate(db, username, password, {})
            if not uid:
                raise RuntimeError("Odoo authentication failed")
            models = xmlrpc.client.ServerProxy(f"{url}/xmlrpc/2/object")
            batch = []

            def flush():
                if not batch:
                    return
                models.execute_kw(db, uid, password, model, "create", [list(batch)])
                batch.clear()

            for row in rows:
                batch.append(row.asDict(recursive=True))
                if len(batch) >= batch_size:
                    flush()
            flush()

        df.foreachPartition(send_partition)


_REGISTRY: dict[str, ExportAdapter] = {
    a.name: a() for a in (WebhookAdapter, OdooXmlRpcAdapter)
}


def get_export_adapter(name: str) -> ExportAdapter:
    """Registry lookup (export_adapters/builtin.py:98-101 equivalent)."""
    try:
        return _REGISTRY[name]
    except KeyError:
        raise ValueError(f"unknown export adapter: {name}") from None


def register_export_adapter(adapter: ExportAdapter) -> None:
    _REGISTRY[adapter.name] = adapter
