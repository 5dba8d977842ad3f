#!/usr/bin/env python3
"""Hypervisor steal-time probe: spin every core for a few seconds and
report the /proc/stat time breakdown over the busy window.

Used to adjudicate bench stamps on this shared host: loadavg only sees
guest-visible runnable tasks, while steal% shows hypervisor-level
contention that slows every task uniformly (the r6g-r6i vs r6c-r6f
band gap — see OPTIMIZATION_r06.md, verification ledger).

Usage: python3 BENCH/steal_probe.py [seconds]
"""
import multiprocessing as mp
import os
import sys
import time


def read_stat():
    with open('/proc/stat') as f:
        parts = f.readline().split()
    # user nice system idle iowait irq softirq steal
    return list(map(int, parts[1:9]))


def spin(sec):
    t = time.time()
    while time.time() - t < sec:
        pass


def main():
    sec = float(sys.argv[1]) if len(sys.argv) > 1 else 8.0
    n = os.cpu_count()
    before = read_stat()
    ps = [mp.Process(target=spin, args=(sec,)) for _ in range(n)]
    t0 = time.time()
    for p in ps:
        p.start()
    for p in ps:
        p.join()
    wall = time.time() - t0
    after = read_stat()
    d = [a - b for a, b in zip(after, before)]
    tot = sum(d)
    names = ['user', 'nice', 'system', 'idle', 'iowait', 'irq', 'softirq',
             'steal']
    print(f'cores={n} wall={wall:.2f}s loadavg={open("/proc/loadavg").read().split()[0]}')
    for name, v in zip(names, d):
        print(f'{name}: {v} ({100 * v / tot:.1f}%)')


if __name__ == '__main__':
    main()
