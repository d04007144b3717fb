"""ChannelSelection + websocket-style subscription bookkeeping.

- ChannelSelection (reference `shared/channel_selection.py:13-111`):
  include/exclude channel lists with deterministic ordering — include
  order wins when given; otherwise catalog order minus excludes.
- SubscriptionManager (reference `modules/web/websocket.py:183-225`):
  per-(channel, key) subscriber sets; a channel is "active" only while
  it has subscribers (≙ make_passive/make_active), which is the signal
  to start/stop its streaming query.  Transport-agnostic: each
  subscriber owns a queue the fan-out thread pushes micro-batch rows
  into.
"""

from __future__ import annotations

import queue
import threading
from typing import Dict, Iterable, List, Optional, Set, Tuple

from pydantic import BaseModel

ALL_KEYS = "*"


class ChannelSelection(BaseModel):
    include: Optional[List[str]] = None
    exclude: List[str] = []

    def select(self, available: Iterable[str]) -> List[str]:
        available = list(available)
        if self.include is not None:
            missing = [c for c in self.include if c not in available]
            if missing:
                raise KeyError(f"selected channels not available: {missing}")
            return [c for c in self.include if c not in self.exclude]
        return [c for c in available if c not in self.exclude]


class Subscription:
    def __init__(self, channel: str, key: str = ALL_KEYS, maxsize: int = 1024):
        self.channel = channel
        self.key = key
        self.queue: "queue.Queue" = queue.Queue(maxsize=maxsize)

    def get(self, timeout: Optional[float] = None):
        return self.queue.get(timeout=timeout)


class SubscriptionManager:
    def __init__(self):
        self._subs: Dict[Tuple[str, str], Set[Subscription]] = {}
        self._lock = threading.Lock()

    def subscribe(self, channel: str, key: str = ALL_KEYS) -> Subscription:
        sub = Subscription(channel, key)
        with self._lock:
            self._subs.setdefault((channel, key), set()).add(sub)
        return sub

    def unsubscribe(self, sub: Subscription) -> None:
        with self._lock:
            group = self._subs.get((sub.channel, sub.key))
            if group:
                group.discard(sub)
                if not group:
                    del self._subs[(sub.channel, sub.key)]

    def is_active(self, channel: str) -> bool:
        """True while anyone subscribes to the channel (any key) —
        the make_active/make_passive signal."""
        with self._lock:
            return any(c == channel for c, _ in self._subs)

    def publish(self, channel: str, rows: List[dict], key_field: Optional[str] = None) -> int:
        """Fan a micro-batch out to matching subscribers; returns the
        number of deliveries.  Slow consumers drop oldest (bounded
        queues — backpressure without blocking the engine)."""
        delivered = 0
        with self._lock:
            groups = [(k, set(v)) for (c, k), v in self._subs.items() if c == channel]
        for key, subs in groups:
            if key == ALL_KEYS:
                matching = rows
            else:
                matching = [r for r in rows if key_field and str(r.get(key_field)) == key]
            if not matching:
                continue
            for sub in subs:
                for row in matching:
                    try:
                        sub.queue.put_nowait(row)
                    except queue.Full:
                        try:
                            sub.queue.get_nowait()
                        except queue.Empty:
                            pass
                        sub.queue.put_nowait(row)
                    delivered += 1
        return delivered
