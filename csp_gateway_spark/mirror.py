"""Mirror / re-route module (reference `modules/mirror.py:10-52`):
copy ticks from one channel onto another — used with a replay source to
mirror another gateway — optionally wiring the target's state channel
with the same key columns.

Spark-first: a mirror is an alias of the source DataFrame registered as
a second producer (`unionByName` happens in the catalog if the target
already has producers); no data movement, no extra shuffle — Catalyst
sees one plan.
"""

from __future__ import annotations

from typing import Dict

from csp_gateway_spark.catalog import ChannelCatalog, GatewayModule


class MirrorChannels(GatewayModule):
    """``mapping``: source channel -> target channel."""

    mapping: Dict[str, str]
    wire_state: bool = True

    def connect(self, channels: ChannelCatalog) -> None:
        for src, dst in self.mapping.items():
            channels.mirror(src, dst)
            if not self.wire_state:
                channels._state_keys.pop(dst, None)
