"""PII scrubbing patterns."""

from llm_food_ray.functions.pii import count_pii, scrub_pii


def test_email():
    assert scrub_pii("mail me at a.b+c@sub.ex.org!") == "mail me at <EMAIL>!"


def test_ipv4():
    assert scrub_pii("host 192.168.1.254 up") == "host <IP> up"
    # out-of-range octet is not an IP
    assert scrub_pii("v1.2.3.999") == "v1.2.3.999"


def test_phone():
    assert scrub_pii("call +1-555-123-4567 now") == "call <PHONE> now"
    assert scrub_pii("call (555) 123 4567") == "call <PHONE>"


def test_order_and_counts():
    t = "x@y.com 10.0.0.1 +1-555-123-4567"
    assert scrub_pii(t) == "<EMAIL> <IP> <PHONE>"
    c = count_pii(t)
    assert (c["n_email"], c["n_ip"], c["n_phone"]) == (1, 1, 1)
    assert count_pii("no pii here") == {"n_email": 0, "n_ip": 0, "n_phone": 0}


def test_extract_entities_order_and_types():
    from llm_food_ray.functions.pii import extract_entities

    text = ("mail a@b.com then b@c.org, server 10.0.0.1 or "
            "call 555-123-4567")
    ents = extract_entities(text)
    assert ("email", "a@b.com", 1) in ents
    assert ("email", "b@c.org", 2) in ents
    assert ("ip", "10.0.0.1", 1) in ents
    assert ("phone", "555-123-4567", 1) in ents
    # an email's digits never double-match as phone/ip (order contract)
    only = extract_entities("x 1.2.3.4@mail.example.com y")
    assert [e for e in only if e[0] != "email"] == []
