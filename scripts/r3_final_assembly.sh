#!/bin/bash
# End-of-round analysis assembly (CPU only - run any time; re-run after
# the chip queues land new measurement logs). Produces:
#   logs/binder_fss_final.json   - four-size FSS crossing table + fits
#   docs/figures/binder_fss.png  - crossing curves + drift extrapolation
#   docs/figures/renyi_profile.png - S2(l') profiles + central-charge inset
#   logs/central_charge_N64_T09.json - VMC c fit (if the r3p profile ran)
set -u
cd /root/repo
export PYTHONPATH=/root/repo

echo "#### FSS final analysis (Binder + corr-ratio, all sizes present) ####"
python scripts/binder_fss_final.py -json logs/binder_fss_final.json

echo "#### figures ####"
python scripts/binder_fss_figure.py
if [ -r logs/renyi_profile_N64_T09.log ]; then
  python scripts/central_charge_fit.py logs/renyi_profile_N64_T09.log -N=64 \
    -lmin=4 -json=logs/central_charge_N64_T09.json || true
fi
python scripts/renyi_profile_figure.py

echo "#### summary ####"
python - <<'EOF'
import json
d = json.load(open("logs/binder_fss_final.json"))
for key, tag in (("pair_crossings", "U"), ("corrratio_crossings", "R")):
    for c in d.get(key, []):
        src = c.get("source", tag)
        print(f"  {src:6s} ({c['n_small']:3d},{c['n_big']:3d}): theta_c = {c['theta_c']:.4f} +/- {c['err']:.4f}")
print(f"  1/N drift fit: theta_c(inf) = {d['theta_c_inf']:.4f} +/- {d['theta_c_inf_err']:.4f}")
f = d.get("power_fit")
if f:
    print(f"  power fit:     theta_c(inf) = {f['theta_c_inf']:.4f} +/- {f['theta_c_inf_err']:.4f} (chi2/dof {f['chi2_dof']:.3g})")
EOF
echo "#### ASSEMBLY DONE ####"
