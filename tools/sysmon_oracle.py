#!/usr/bin/env python3
"""Test-fixture oracle: replay the reference loader's graph semantics
(/root/reference/events.py) in memory and print node/edge counts, to
pin expected values for SysmonGraphSpec. Not part of the library.

Usage: python3 tools/sysmon_oracle.py <trace.json> [...]
"""
import json
import os
import sys
import re


def tagdict(span):
    d = {}
    for t in span.get("tags", []) or []:
        d[t.get("key")] = t.get("value")
    return d


def co(d, *keys):
    for k in keys:
        if k in d and d[k]:
            return d[k]
    return None


def basename_posix(p):
    # os.path.basename on a POSIX host: '/' only
    if p is None:
        return ""
    s = str(p)
    return s.rsplit("/", 1)[-1]


def parse_reg_target(target):
    if not target:
        return None, None
    parts = str(target).rstrip("\\").split("\\")
    if len(parts) >= 2:
        return "\\".join(parts[:-1]), parts[-1]
    return target, None


def load(paths):
    nodes = {}   # (label, id) -> props dict (first/last semantics tracked inline)
    created = set()
    edges = {}   # (etype, src, dst) -> props

    def merge_node(label, nid, oncreate=None, onmatch=None):
        key = (label, nid)
        if key not in nodes:
            nodes[key] = dict(oncreate or {})
            created.add(key)
        else:
            for k, v in (onmatch or {}).items():
                if v is not None:
                    nodes[key][k] = v

    def merge_proc(key, trace, guid, pguid, image, cmd):
        k = ("Process", key)
        if k not in nodes:
            nodes[k] = {"image": image, "CommandLine": cmd}
        else:
            p = nodes[k]
            for prop, v in [("ProcessGuid", guid), ("ParentProcessGuid", pguid),
                            ("image", image), ("CommandLine", cmd)]:
                if v is not None:
                    p[prop] = v
        edges[("HAS_PROCESS", trace, key)] = {}

    def set_edge(etype, src, dst, **props):
        cur = edges.setdefault((etype, src, dst), {})
        if etype == "TAMPERED":
            d = props.pop("details", None)
            cur.update(props)
            if d is not None:
                cur["details"] = d
        else:
            cur.update(props)

    for path in paths:
        data = json.load(open(path, encoding="utf-8-sig"))
        trace = data.get("traceID") or f"FILE::{os.path.basename(path)}"
        merge_node("Trace", trace)
        spans = sorted(data.get("spans", []), key=lambda x: x.get("startTime", 0))
        for span in spans:
            tags = tagdict(span)
            if "EventID" in tags and isinstance(tags["EventID"], str):
                try:
                    tags["EventID"] = int(tags["EventID"])
                except Exception:
                    pass
            ev = co(tags, "EventID", "ID")
            guid = co(tags, "ProcessGuid", "process_guid", "ProcessGUID")
            pguid = co(tags, "ParentProcessGuid", "parent_process_guid", "ParentProcessGUID")
            pid = co(tags, "ProcessId", "process_id", "pid", "Pid", "processId")
            ppid = co(tags, "ParentProcessId", "parent_pid", "ParentPid", "ppid",
                      "parentPid", "sysmon.ppid")
            img_raw = co(tags, "Image", "process_path", "ImagePath", "image", "PathToImage")
            cmd = co(tags, "CommandLine", "command_line")
            if str(ev) in {"8", "10", "25"}:
                if not guid:
                    guid = co(tags, "SourceProcessGuid", "SourceProcessGUID", "source_process_guid")
                if not pid:
                    pid = co(tags, "SourceProcessId", "source_process_id")
                if not img_raw:
                    img_raw = co(tags, "SourceImage")
            image = basename_posix(str(img_raw or ""))
            pkey = guid if guid else (f"{trace}:{pid}" if pid else None)
            if pkey:
                merge_proc(pkey, trace, guid, pguid, image, cmd)
                parent_key = None
                if pguid:
                    parent_key = pguid
                    merge_proc(parent_key, trace, pguid, None, None, None)
                elif ppid:
                    parent_key = f"{trace}:{ppid}"
                    merge_proc(parent_key, trace, None, None, None, None)
                if parent_key:
                    set_edge("SPAWNS", parent_key, pkey)
            sev = str(ev)
            if sev == "2" and pkey:
                t = co(tags, "TargetFilename", "Path")
                if t:
                    merge_node("File", t)
                    set_edge("MODIFIED_FILE_TIME", pkey, t, what="CreationTime")
            if sev == "3" and pkey:
                dip = co(tags, "DestinationIp", "dst_ip")
                dport = co(tags, "DestinationPort", "dst_port")
                proto = co(tags, "Protocol")
                dhost = co(tags, "DestinationHostname")
                if dip:
                    merge_node("Ip", dip)
                    set_edge("CONNECTED_TO", pkey, dip, proto=proto, dport=dport)
                if dhost:
                    dh = str(dhost).lower()
                    merge_node("Ip", dh)
                    set_edge("CONNECTED_TO", pkey, dh, proto=proto, dport=dport)
            if sev == "6" and pkey:
                img = co(tags, "ImageLoaded", "Image")
                if img:
                    merge_node("File", img)
                    set_edge("LOADED_DRIVER", pkey, img)
            if sev == "7" and pkey:
                img = co(tags, "ImageLoaded", "Image")
                if img:
                    merge_node("File", img)
                    set_edge("LOADED_MODULE", pkey, img)
            if sev in ("8", "10", "25"):
                dst_pid = co(tags, "TargetProcessId", "TargetPid")
                dst_guid = co(tags, "TargetProcessGuid", "TargetProcessGUID", "target_process_guid")
                if pkey and (dst_guid or dst_pid):
                    dst_key = dst_guid if dst_guid else (f"{trace}:{dst_pid}" if dst_pid else None)
                    if dst_key:
                        merge_proc(dst_key, trace, dst_guid, None, None, None)
                        if sev == "8":
                            set_edge("INJECTED_THREAD", pkey, dst_key)
                        elif sev == "10":
                            set_edge("ACCESSED_PROCESS", pkey, dst_key,
                                     grantedAccess=co(tags, "GrantedAccess"))
                        else:
                            set_edge("TAMPERED", pkey, dst_key,
                                     details=co(tags, "Details", "Info"))
            if sev == "9" and pkey:
                dv = co(tags, "Device")
                if dv:
                    merge_node("Device", dv)
                    set_edge("RAW_READ", pkey, dv)
            if sev == "11" and pkey:
                t = co(tags, "TargetFilename", "Path")
                if t:
                    merge_node("File", t)
                    set_edge("CREATED_FILE", pkey, t)
            if sev == "12" and pkey:
                et = co(tags, "EventType")
                kp = co(tags, "TargetObject")
                if kp:
                    merge_node("RegistryKey", kp)
                    low = str(et).lower() if et else ""
                    if low.startswith("create"):
                        set_edge("CREATED_REG_KEY", pkey, kp)
                    elif low.startswith("delete"):
                        set_edge("DELETED_REG_KEY", pkey, kp)
            if sev == "13" and pkey:
                t = co(tags, "TargetObject")
                if t:
                    kp, vn = parse_reg_target(t)
                    if kp:
                        merge_node("RegistryKey", kp)
                    merge_node("RegistryValue", t)
                    nodes[("RegistryValue", t)]["valueName"] = vn
                    if kp:
                        set_edge("UNDER_KEY", t, kp)
                    set_edge("SET_REG_VALUE", pkey, t, valueName=vn)
            if sev == "14" and pkey:
                old = co(tags, "TargetObject")
                new = co(tags, "NewName", "NewDetails")
                if old and new:
                    merge_node("RegistryKey", old)
                    merge_node("RegistryKey", new)
                    set_edge("RENAMED_REG_KEY", pkey, new)
                    set_edge("RENAMED_TO", old, new)
            if sev == "15" and pkey:
                t = co(tags, "TargetFilename", "Path")
                if t:
                    merge_node("File", t)
                    set_edge("CREATED_STREAM", pkey, t,
                             stream=co(tags, "StreamName", "Stream"),
                             hash=co(tags, "Hash", "Hashes"))
            if sev == "17" and pkey:
                pn = co(tags, "PipeName", "Pipe")
                if pn:
                    merge_node("Pipe", pn)
                    set_edge("CREATED_PIPE", pkey, pn)
            if sev == "18" and pkey:
                pn = co(tags, "PipeName", "Pipe")
                if pn:
                    merge_node("Pipe", pn)
                    set_edge("CONNECTED_PIPE", pkey, pn)
            if sev == "19" and pkey:
                fn = co(tags, "FilterName", "Name", "EventFilterName")
                if fn:
                    merge_node("WmiFilter", fn, onmatch={"query": co(tags, "Query", "QueryName")},
                               oncreate={"query": co(tags, "Query", "QueryName")})
            if sev == "20" and pkey:
                cn = co(tags, "ConsumerName", "Name", "Consumer")
                if cn:
                    merge_node("WmiConsumer", cn,
                               onmatch={"command": co(tags, "CommandLine", "Command")},
                               oncreate={"command": co(tags, "CommandLine", "Command")})
            if sev == "21" and pkey:
                f = co(tags, "FilterName", "Filter")
                c = co(tags, "ConsumerName", "Consumer")
                # reference wmi_bind MATCHes (never MERGEs) both endpoint
                # nodes (events.py:155-160): the edge only exists if a
                # prior event 19/20 already created them
                if f and c and ("WmiFilter", f) in nodes and ("WmiConsumer", c) in nodes:
                    set_edge("BIND_TO", f, c)
            if sev in ("23", "26") and pkey:
                t = co(tags, "TargetFilename", "Path")
                if t:
                    merge_node("File", t)
                    set_edge("DELETED_FILE", pkey, t)
            if sev == "27" and pkey:
                t = co(tags, "TargetFilename", "Path")
                if t:
                    merge_node("File", t)
                    set_edge("CREATED_EXECUTABLE", pkey, t, mode="blocked")
            if sev == "29" and pkey:
                t = co(tags, "TargetFilename", "Path")
                if t:
                    merge_node("File", t)
                    set_edge("CREATED_EXECUTABLE", pkey, t, mode="detected")
    return nodes, edges


if __name__ == "__main__":
    nodes, edges = load(sys.argv[1:])
    from collections import Counter
    nl = Counter(l for l, _ in nodes)
    el = Counter(t for t, _, _ in edges)
    print("NODES", dict(sorted(nl.items())))
    print("EDGES", dict(sorted(el.items())))
    print("TOTAL nodes", len(nodes), "edges", len(edges))
