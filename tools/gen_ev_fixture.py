#!/usr/bin/env python3
"""Deterministic generator for data/ev_fixture.csv (FIXTURES.md §1).

Dev tool only — the fixture is checked in; regenerate only if the
quirk coverage needs to change. Mirrors the reference dataset's shape
(24 columns, header) and covers every quirk row class:
  - mangled years 0014-/0015- (fix_year path, including its
    seconds-truncation side effect), plus sane 2015- rows
  - literal "NA" distance (string-typed column -> cast null -> rule)
  - kwhTotal = 0, negative dollars, chargeTimeHrs <= 0
  - off-domain facilityType (5) and weekday (Thurs)
  - NULL userId / created / ended, ended <= created
  - one duplicate sessionId pair (uniqueness metric < 1)
"""
import csv
import sys

HEADER = ("sessionId,kwhTotal,dollars,created,ended,startTime,endTime,"
          "chargeTimeHrs,weekday,platform,distance,userId,stationId,"
          "locationId,managerVehicle,facilityType,Mon,Tues,Wed,Thurs,"
          "Fri,Sat,Sun,reportedZip").split(",")

WEEKDAYS = ["Mon", "Tue", "Wed", "Thu", "Fri", "Sat", "Sun"]
PLATFORMS = ["android", "ios", "web"]


def onehot(wd):
    cols = ["Mon", "Tues", "Wed", "Thurs", "Fri", "Sat", "Sun"]
    idx = {"Mon": 0, "Tue": 1, "Wed": 2, "Thu": 3, "Fri": 4, "Sat": 5,
           "Sun": 6, "Thurs": 3}.get(wd, 0)
    return [1 if i == idx else 0 for i in range(7)]


def mkrow(sid, kwh, dollars, created, ended, hrs, wd, plat, dist, uid,
          station, loc, mgr, ftype):
    st = created.split(" ")[1].split(":")[0] if created else 0
    et = ended.split(" ")[1].split(":")[0] if ended else 0
    return [sid, kwh, dollars, created, ended, st, et, hrs, wd, plat,
            dist, uid, station, loc, mgr, ftype] + onehot(wd) + [0]


def main():
    rows = []
    # 40 good rows: mangled 0014/0015 years, mixed attributes
    for i in range(40):
        day = 1 + (i % 27)
        prefix = "0014" if i % 5 == 0 else "0015"
        mo = 1 + (i % 12)
        h = 6 + (i % 14)
        created = f"{prefix}-{mo:02d}-{day:02d} {h:02d}:1{i%10}:2{i%6}"
        ended = f"{prefix}-{mo:02d}-{day:02d} {h+2:02d}:0{i%10 if i%10<6 else 5}:11"
        dist = "NA" if i % 4 == 0 else f"{5 + (i % 20)}.{i % 10}"
        rows.append(mkrow(
            1000 + i, round(2.5 + 0.37 * i, 2), round(0.5 * (i % 7), 2),
            created, ended, round(1.2 + 0.11 * i, 4),
            WEEKDAYS[i % 7], PLATFORMS[i % 3], dist,
            7000 + i % 9, 500 + i % 6, 40 + i % 3, i % 2, 1 + i % 4))
    # sane modern-year rows (no fix needed)
    for i in range(5):
        rows.append(mkrow(
            2000 + i, 6.5 + i, 1.25 * i, f"2015-06-1{i} 09:30:0{i}",
            f"2015-06-1{i} 11:45:3{i}", 2.25, "Fri", "web",
            f"12.{i}", 7100 + i, 510 + i, 44, 0, 2))
    # quarantine classes
    rows.append(mkrow(3001, 0, 1.0, "0015-03-05 10:00:00", "0015-03-05 12:00:00",
                      2.0, "Mon", "android", "9.1", 7201, 520, 45, 0, 1))   # kwh=0
    rows.append(mkrow(3002, 4.2, -0.5, "0015-03-06 10:00:00", "0015-03-06 12:00:00",
                      2.0, "Tue", "ios", "9.2", 7202, 521, 45, 0, 2))       # dollars<0
    rows.append(mkrow(3003, 4.2, 1.0, "0015-03-07 10:00:00", "0015-03-07 12:00:00",
                      0, "Wed", "web", "9.3", 7203, 522, 45, 0, 3))         # hrs<=0
    rows.append(mkrow(3004, 4.2, 1.0, "0015-03-08 10:00:00", "0015-03-08 12:00:00",
                      2.0, "Thu", "android", "9.4", 7204, 523, 45, 0, 5))   # ftype off-domain
    rows.append(mkrow(3005, 4.2, 1.0, "0015-03-09 10:00:00", "0015-03-09 12:00:00",
                      2.0, "Thurs", "ios", "9.5", 7205, 524, 45, 0, 4))     # weekday off-domain (passes)
    rows.append(mkrow(3006, 4.2, 1.0, "", "0015-03-10 12:00:00",
                      2.0, "Fri", "web", "9.6", 7206, 525, 45, 0, 1))       # created null
    rows.append(mkrow(3007, 4.2, 1.0, "0015-03-11 10:00:00", "",
                      2.0, "Sat", "android", "9.7", 7207, 526, 45, 0, 2))   # ended null
    rows.append(mkrow(3008, 4.2, 1.0, "0015-03-12 12:00:00", "0015-03-12 10:00:00",
                      2.0, "Sun", "ios", "9.8", 7208, 527, 45, 0, 3))       # end<=start
    rows.append(mkrow(3009, 4.2, 1.0, "0015-03-13 10:00:00", "0015-03-13 12:00:00",
                      2.0, "Mon", "web", "9.9", "", 528, 45, 0, 4))         # userId null
    rows.append(mkrow(2000, 5.5, 2.0, "2015-07-01 08:00:00", "2015-07-01 10:00:00",
                      2.0, "Wed", "web", "11.0", 7300, 530, 46, 1, 1))      # dup sessionId (2000)

    with open(sys.argv[1] if len(sys.argv) > 1 else "data/ev_fixture.csv",
              "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(HEADER)
        w.writerows(rows)
    print(f"wrote {len(rows)} rows")


if __name__ == "__main__":
    main()
