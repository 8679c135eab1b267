#!/bin/bash
# Round-4 reference-side BaseModel seeds (VERDICT Next #1a).
# seed 1 resumes from the iter-250 checkpoint left by round 3; seed 2 is fresh.
cd /root/repo
nice -n 15 python scripts/reference_headtohead.py --side ref --model BaseModel --concat --seed 1 --tag basemodel_s1 --resume_iter 250 > /tmp/ref_bm_s1.log 2>&1
nice -n 15 python scripts/reference_headtohead.py --side ref --model BaseModel --concat --seed 2 --tag basemodel_s2 > /tmp/ref_bm_s2.log 2>&1
echo DONE > /tmp/ref_bm_seeds.done
