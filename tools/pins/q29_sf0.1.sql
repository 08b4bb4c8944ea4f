WITH e AS (SELECT event_id, user_id, ts,
    CASE WHEN event_id % 2 = 0 THEN 'jr' ELSE 'ja' END AS kind
  FROM events WHERE event_id < 400),
p AS (SELECT event_id, user_id, kind,
    lead(kind) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_kind
  FROM e),
k(event_id, nwk_s_key, app_s_key) AS (VALUES
  (12, '9522d7b2436074df86e13e4341653a3e', '26ed20893e7bf7ee3e5e751c5174eb00'),
  (50, '36e588362ed689c4194ffa2ee807e708', 'e2feb832e5cc01d7d63069d0284f7cfc'),
  (92, '0c2a096e0d5ac7850396414592e6c295', 'bd3de5c627eee3edf8cd9dd93ed00208'),
  (102, 'ae35147e581cd2b45a7fd68d41509c4d', '5026c688eb9d9710984e923eb1f5f967'),
  (118, '665251e68b0df978d0bfc39963a49703', 'eeffcf09ddc8d640ccf10a8c99bf8a06'),
  (132, '6e09a00c3d8782d69ffc19fd607319eb', '4ac3f52e5ac2d203e5e848d078573765'),
  (136, '04d5783cb3693a937eefbf1c41b0cbe2', 'a027443cb6880301e4dabe000de3be00'),
  (184, '7a01f12774ba8573cec9ed70f6a39a77', '95fe9cd112e7fb2f75367f098ed10c10'),
  (208, '23ccf9f6d18545fff434f79412bb29f8', '3ff7e683d6f76e663806e4e6f6c94588'),
  (220, 'd6408661e55976f2bd414912fe60ec8c', '80341e764b27ea124b93a7c448a4b316'),
  (268, '0a7837feed8d6261959ea7af3b3c53eb', '7ca89513bc52d2376e74fff6745de39b'),
  (380, '0387a7c28ab332965477beed4f754df8', '1c450bbb2087d57bbf0afe983cca99cd'))
SELECT p.event_id, p.user_id, k.nwk_s_key, k.app_s_key
FROM p LEFT JOIN k ON p.event_id = k.event_id
WHERE p.kind = 'jr' AND p.next_kind = 'ja'
ORDER BY p.event_id
