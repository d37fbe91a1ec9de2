"""Message broker — the data plane between edge devices and middleware.

The reference uses RabbitMQ via pika BlockingConnections
(`devices/message_broker/{publisher,consumer}.py`), an external daemon.
Default here is an in-process broker with the same Publisher/Consumer API
(queue-per-device, `QueueBase + deviceName` naming,
`devices/middleware/middleware.py:167`), which keeps tests hermetic
(SURVEY.md §7 Phase 6).  A pika-backed pair with the identical interface is
provided behind `use_rabbitmq=True` for drop-in parity when a broker daemon
exists.
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Dict, Optional


class InProcessBroker:
    """Process-wide topic -> queue registry."""

    _lock = threading.Lock()
    _queues: Dict[str, "queue.Queue[bytes]"] = {}

    @classmethod
    def get_queue(cls, name: str) -> "queue.Queue[bytes]":
        with cls._lock:
            if name not in cls._queues:
                cls._queues[name] = queue.Queue()
            return cls._queues[name]

    @classmethod
    def reset(cls) -> None:
        with cls._lock:
            cls._queues.clear()


class Publisher:
    """API shape of `devices/message_broker/publisher.py:4-19`."""

    def __init__(self, use_rabbitmq: bool = False):
        self.use_rabbitmq = use_rabbitmq
        if use_rabbitmq:
            import pika  # gated: external daemon required
            self._conn = pika.BlockingConnection(
                pika.ConnectionParameters("localhost"))
            self._channel = self._conn.channel()

    def declare_queue(self, queue_name: str) -> None:
        if self.use_rabbitmq:
            self._channel.queue_declare(queue=queue_name)
        else:
            InProcessBroker.get_queue(queue_name)

    def publish_data(self, queue_name: str, body) -> None:
        if isinstance(body, str):
            body = body.encode()
        if self.use_rabbitmq:
            self._channel.basic_publish(exchange="", routing_key=queue_name,
                                        body=body)
        else:
            InProcessBroker.get_queue(queue_name).put(body)

    def close(self) -> None:
        if self.use_rabbitmq:
            self._conn.close()


class Consumer:
    """API shape of `devices/message_broker/consumer.py:4-24`."""

    def __init__(self, use_rabbitmq: bool = False):
        self.use_rabbitmq = use_rabbitmq
        self._callback: Optional[Callable] = None
        self._queue_name: Optional[str] = None
        self._stop = threading.Event()
        if use_rabbitmq:
            import pika
            self.connection = pika.BlockingConnection(
                pika.ConnectionParameters("localhost"))
            self.channel = self.connection.channel()

    def declare_queue(self, queue_name: str) -> None:
        if self.use_rabbitmq:
            self.channel.queue_declare(queue=queue_name)
        else:
            InProcessBroker.get_queue(queue_name)

    def consume_data(self, queue_name: str, callback: Callable) -> None:
        self._queue_name = queue_name
        self._callback = callback
        if self.use_rabbitmq:
            self.channel.basic_consume(queue=queue_name,
                                       on_message_callback=callback,
                                       auto_ack=True)

    def start_consuming(self) -> None:
        if self.use_rabbitmq:
            self.channel.start_consuming()
            return
        q = InProcessBroker.get_queue(self._queue_name)
        while not self._stop.is_set():
            try:
                body = q.get(timeout=0.1)
            except queue.Empty:
                continue
            # pika signature: (channel, method, properties, body)
            self._callback(None, None, None, body)

    def stop_consuming(self) -> None:
        self._stop.set()
        if self.use_rabbitmq:
            self.channel.stop_consuming()
