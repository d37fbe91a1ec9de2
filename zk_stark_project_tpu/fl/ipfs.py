"""IPFS stub — pickle-file KV store returning fake links
(reference `devices/middleware/ipfs.py:5-64`)."""

from __future__ import annotations

import os
import pickle
from typing import Dict, Optional


class IPFSConnector:
    def __init__(self, data_file_path: str = "ipfs.pickle"):
        self.data_file_path = data_file_path
        if os.path.exists(self.data_file_path):
            os.remove(self.data_file_path)
        self.data: Dict[str, object] = {}
        self.inner_counter = 0
        self._save()

    def _save(self) -> None:
        with open(self.data_file_path, "wb") as f:
            pickle.dump(self.data, f, protocol=pickle.HIGHEST_PROTOCOL)
        self.inner_counter += 1

    def save_value(self, key, value) -> None:
        self.data[key] = value
        self._save()

    def get_value(self, key: str) -> Optional[object]:
        return self.data.get(key)

    def save_global_weight(self, value) -> str:
        link = f"https://example.com/link-gw-{self.inner_counter}"
        self.save_value(link, value)
        return link

    def get_global_weight(self, link: str):
        return self.get_value(link)

    def save_global_bias(self, value) -> str:
        link = f"https://example.com/link-gb-{self.inner_counter}"
        self.save_value(link, value)
        return link

    def get_global_bias(self, link: str):
        return self.get_value(link)
