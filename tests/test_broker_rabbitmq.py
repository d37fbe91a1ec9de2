"""Exercise the RabbitMQ (pika) branch of `fl/broker.py`.

The reference runs against a live local RabbitMQ daemon
(`devices/message_broker/publisher.py:4-19`); neither the daemon nor pika
exist in this environment, so these tests drive the pika code path through
a faithful in-memory fake of the pika API surface the broker uses
(BlockingConnection / ConnectionParameters / channel queue_declare /
basic_publish / basic_consume / start_consuming / stop_consuming).  If a
real pika + broker are present, the same tests run against them instead
(integration mode).
"""

import sys
import threading
import types

import pytest


def _real_pika_available():
    try:
        import pika  # noqa: F401

        return True
    except ImportError:
        return False


class _FakeChannel:
    """Queue-per-name in-memory stand-in for a pika channel."""

    _queues = {}
    _lock = threading.Lock()

    def __init__(self):
        self._consumers = []
        self._stopped = threading.Event()

    @classmethod
    def reset(cls):
        with cls._lock:
            cls._queues.clear()

    def queue_declare(self, queue):
        with self._lock:
            self._queues.setdefault(queue, [])

    def basic_publish(self, exchange, routing_key, body):
        assert exchange == ""  # broker publishes to the default exchange
        with self._lock:
            self._queues.setdefault(routing_key, []).append(body)

    def basic_consume(self, queue, on_message_callback, auto_ack):
        assert auto_ack is True
        self._consumers.append((queue, on_message_callback))

    def start_consuming(self):
        while not self._stopped.is_set():
            delivered = False
            for queue, cb in self._consumers:
                with self._lock:
                    pending = self._queues.get(queue, [])
                    body = pending.pop(0) if pending else None
                if body is not None:
                    cb(self, None, None, body)
                    delivered = True
            if not delivered:
                self._stopped.wait(0.01)

    def stop_consuming(self):
        self._stopped.set()


class _FakeConnection:
    def __init__(self, params):
        self.params = params
        self.closed = False

    def channel(self):
        return _FakeChannel()

    def close(self):
        self.closed = True


@pytest.fixture
def pika_env(monkeypatch):
    if _real_pika_available():
        yield "real"
        return
    fake = types.ModuleType("pika")
    fake.BlockingConnection = _FakeConnection
    fake.ConnectionParameters = lambda host: ("params", host)
    monkeypatch.setitem(sys.modules, "pika", fake)
    _FakeChannel.reset()
    yield "fake"


def test_rabbitmq_publish_consume_roundtrip(pika_env):
    from zk_stark_project_tpu.fl.broker import Consumer, Publisher

    pub = Publisher(use_rabbitmq=True)
    con = Consumer(use_rabbitmq=True)
    qname = "test_device_queue_7"
    pub.declare_queue(qname)
    con.declare_queue(qname)

    got = []

    def cb(ch, method, properties, body):
        got.append(body)
        con.stop_consuming()

    con.consume_data(qname, cb)
    pub.publish_data(qname, "1.5,2.5,3.5")

    t = threading.Thread(target=con.start_consuming)
    t.start()
    t.join(timeout=5)
    assert not t.is_alive(), "consumer did not stop"
    assert got == [b"1.5,2.5,3.5"]
    pub.close()


def test_rabbitmq_queue_naming_matches_reference(pika_env):
    """Queue name = QueueBase + deviceName, the reference's per-device
    queue convention (`devices/middleware/middleware.py:167`)."""
    from zk_stark_project_tpu.fl.broker import Publisher
    from zk_stark_project_tpu.fl.config import FLConfig

    cfg = FLConfig(num_participants=2)
    pub = Publisher(use_rabbitmq=True)
    for i in range(cfg.num_participants):
        pub.declare_queue(f"{cfg.queue_base}Device_{i + 1}")
    pub.close()
