"""Gas logger (vestigial in the reference too — `devices/utils/gas.py:20-59`
remains from the abandoned on-chain version; the off-chain
ConnectionManager never calls it).  Ported for inventory parity: records
account balances to balance.csv + a dedicated gas_logs.log.  web3 import is
gated — without it (or a node) `log_balance` records NaN.
"""

from __future__ import annotations

import csv
import logging
import os
import time
from typing import Optional


def _get_logger(log_path: str) -> logging.Logger:
    logger = logging.getLogger("gas")
    if not logger.handlers:
        handler = logging.FileHandler(log_path)
        handler.setFormatter(logging.Formatter("%(asctime)s %(message)s"))
        logger.addHandler(handler)
        logger.setLevel(logging.INFO)
    return logger


class GasLogger:
    def __init__(self, csv_path: str = "balance.csv",
                 log_path: str = "gas_logs.log",
                 provider_url: Optional[str] = None):
        self.csv_path = csv_path
        self.logger = _get_logger(log_path)
        self.web3 = None
        if provider_url:
            try:
                from web3 import Web3
                self.web3 = Web3(Web3.HTTPProvider(provider_url))
            except ImportError:
                self.logger.info("web3 unavailable; recording NaN balances")

    def get_balance(self, account: str) -> float:
        if self.web3 is not None:
            try:
                return float(self.web3.eth.get_balance(account))
            except Exception as e:  # node unreachable etc.
                self.logger.info(f"balance fetch failed: {e}")
        return float("nan")

    def log_balance(self, account: str, round_nr: int) -> float:
        balance = self.get_balance(account)
        exists = os.path.exists(self.csv_path)
        with open(self.csv_path, "a", newline="") as f:
            w = csv.writer(f)
            if not exists:
                w.writerow(["timestamp", "round", "account", "balance"])
            w.writerow([time.strftime("%Y-%m-%d %H:%M:%S"), round_nr,
                        account, balance])
        self.logger.info(f"round {round_nr} account {account} "
                         f"balance {balance}")
        return balance
