#!/bin/bash
cd /root/repo
echo "=== [1] kbench 1024 default (verify dW io_blocks=3 fix) ==="
timeout 4000 python -u tools/kbench.py 1024
echo "rc=$? for default run"
echo "=== [2] kbench 1024 KB_CONTRACT=dot ==="
KB_CONTRACT=dot timeout 4000 python -u tools/kbench.py 1024
echo "rc=$? for dot run"
echo "=== done ==="
