#!/bin/bash
# Unattended measurement session for when the TPU tunnel returns.
# Order matters: cheapest/most-diagnostic first, cumulative bench last.
LOG=/root/repo/scratch/chip_r3
mkdir -p $LOG
cd /root/repo
echo "start $(date)" > $LOG/session.log
timeout 900  python scratch/an_joinscan_chip.py  > $LOG/joinscan.log 2>&1
echo "joinscan rc=$?" >> $LOG/session.log
timeout 2400 python scratch/an_tgf_inmodel.py    > $LOG/tgf_inmodel.log 2>&1
echo "tgf rc=$?" >> $LOG/session.log
TASEG_BENCH_TOPO_DETAIL=1 timeout 2400 python bench.py > $LOG/bench_detail.log 2>&1
echo "bench_detail rc=$?" >> $LOG/session.log
TASEG_BENCH_BATCH=2 timeout 2400 python bench.py > $LOG/bench_b2.log 2>&1
echo "bench_b2 rc=$?" >> $LOG/session.log
TASEG_NO_GROUPED_RB=1 timeout 2400 python bench.py > $LOG/bench_nogrouped.log 2>&1
echo "bench_nogrouped rc=$?" >> $LOG/session.log
TASEG_TGF_MAX_CIN=512 timeout 2400 python bench.py > $LOG/bench_tgf512.log 2>&1
echo "bench_tgf512 rc=$?" >> $LOG/session.log
TASEG_BENCH_TRAIN=1 timeout 2400 python bench.py > $LOG/bench_train.log 2>&1
echo "bench_train rc=$?" >> $LOG/session.log
echo "end $(date)" >> $LOG/session.log
touch $LOG/DONE
